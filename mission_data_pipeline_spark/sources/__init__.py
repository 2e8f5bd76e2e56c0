from mission_data_pipeline_spark.sources.binary import read_packets
from mission_data_pipeline_spark.sources.csv import read_csv_telemetry
from mission_data_pipeline_spark.sources.tables import load_table, load_tables

__all__ = ["read_packets", "read_csv_telemetry", "load_table", "load_tables"]
