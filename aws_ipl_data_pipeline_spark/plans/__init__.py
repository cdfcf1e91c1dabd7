from aws_ipl_data_pipeline_spark.plans.bronze import to_bronze  # noqa: F401
from aws_ipl_data_pipeline_spark.plans.gold import (  # noqa: F401
    batsman_stats,
    bowler_stats,
    team_stats,
    tournament_standings,
)
from aws_ipl_data_pipeline_spark.plans.silver import to_silver  # noqa: F401
