from mission_data_pipeline_spark.cli.main import cli

if __name__ == "__main__":
    cli()
