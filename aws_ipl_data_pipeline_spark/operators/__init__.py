from aws_ipl_data_pipeline_spark.operators import (  # noqa: F401
    asof,
    dedup,
    multimodal,
    similarity,
    text,
)
