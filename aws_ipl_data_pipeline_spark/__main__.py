from aws_ipl_data_pipeline_spark.cli import main

main()
