"""CSV telemetry scan → tidy long parameters.

Capability parity: reference ``src/mdp/plugins/extractors/csv.py:42-98``:
required time/apid/seq_count columns (names configurable), every other
column (or an explicit list) becomes a parameter, NaN cells are dropped,
``eng_value`` starts equal to ``raw_value``.

Spark-first shape: a native csv scan (schema inference or caller schema,
column pruning pushed to the reader) followed by ``stack()`` to melt
wide → long. The melt is a zero-shuffle narrow transform; NaN-drop is a
plain filter that Catalyst can push around.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mission_data_pipeline_spark.models.schemas import PARAMS_SCHEMA


def melt_telemetry(
    raw: DataFrame,
    *,
    time_column: str = "time",
    apid_column: str = "apid",
    seq_count_column: str = "seq_count",
    parameter_columns: list[str] | None = None,
) -> DataFrame:
    """Melt a wide telemetry frame to the tidy PARAMS_SCHEMA (shared by
    the batch reader and the Structured Streaming source)."""
    required = [time_column, apid_column, seq_count_column]
    missing = [c for c in required if c not in raw.columns]
    if missing:
        raise ValueError(f"CSV missing required columns: {missing}")
    params = parameter_columns or [c for c in raw.columns if c not in required]
    absent = [c for c in params if c not in raw.columns]
    if absent:
        raise ValueError(f"parameter_columns not in CSV: {absent}")

    # stack(n, 'name1', col1, 'name2', col2, ...) — wide → long melt.
    # Each column is cast to DOUBLE inside the stack: schema inference
    # types an all-integer column INT and stack() requires homogeneous
    # branches, so a mixed-type telemetry file would otherwise fail to
    # plan (raw_value is DOUBLE in PARAMS_SCHEMA regardless).
    stack_args = ", ".join(f"'{p}', CAST(`{p}` AS DOUBLE)" for p in params)
    long_df = raw.select(
        F.col(apid_column).cast("int").alias("apid"),
        F.col(seq_count_column).cast("int").alias("seq_count"),
        F.col(time_column).cast("double").alias("time_tai"),
        F.expr(f"stack({len(params)}, {stack_args}) as (name, raw_value)"),
    ).filter(F.col("raw_value").isNotNull() & ~F.isnan(F.col("raw_value").cast("double")))

    return long_df.select(
        F.col("name"),
        F.col("apid"),
        F.col("seq_count"),
        F.col("time_tai"),
        F.col("raw_value").cast("double").alias("raw_value"),
        F.lit(None).cast("string").alias("raw_value_str"),
        F.col("raw_value").cast("double").alias("eng_value"),
        F.lit(None).cast("string").alias("eng_value_str"),
        F.lit(None).cast("string").alias("unit"),
        F.lit(True).alias("validity"),
        F.lit(None).cast("string").alias("calibration_id"),
        F.lit(False).alias("out_of_limit"),
        F.lit(0).alias("alarm_level"),
    ).select([F.col(f.name).cast(f.dataType) for f in PARAMS_SCHEMA.fields])


def read_csv_telemetry(
    spark: SparkSession,
    path: str,
    *,
    time_column: str = "time",
    apid_column: str = "apid",
    seq_count_column: str = "seq_count",
    parameter_columns: list[str] | None = None,
    delimiter: str = ",",
    source_id: str | None = None,
) -> DataFrame:
    """Read a wide telemetry CSV and melt it to the tidy PARAMS_SCHEMA."""
    raw = (
        spark.read.option("header", "true")
        .option("sep", delimiter)
        .option("inferSchema", "true")
        .csv(path)
    )
    return melt_telemetry(
        raw,
        time_column=time_column,
        apid_column=apid_column,
        seq_count_column=seq_count_column,
        parameter_columns=parameter_columns,
    )
