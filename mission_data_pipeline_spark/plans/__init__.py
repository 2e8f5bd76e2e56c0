from mission_data_pipeline_spark.plans.queries import QUERIES, Query

__all__ = ["QUERIES", "Query"]
