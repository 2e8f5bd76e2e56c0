"""Loaders for the driver-provided relational test tables (TESTDATA.md).

``events.ts`` arrives as TIMESTAMP(NANOS) parquet, which Spark cannot
represent; with ``spark.sql.legacy.parquet.nanosAsLong`` the column reads
as epoch-nanosecond longs, and we expose both the raw long (``ts_ns``)
and a truncated-to-microsecond ``ts`` timestamp column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = (
            df.withColumnRenamed("ts", "ts_ns")
            .withColumn("ts", F.timestamp_micros((F.col("ts_ns") / 1000).cast("long")))
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}
