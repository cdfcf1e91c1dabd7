from aws_ipl_data_pipeline_spark.functions import events, fuzzy, scalars  # noqa: F401
