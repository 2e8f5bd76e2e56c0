"""CSV sinks.

Parity: reference ``src/mdp/plugins/loaders/csv.py`` (L6 per-parameter
``:41-56``, L7 wide ``:58-68``). Per-parameter output is a partitioned
directory per name (same rationale as the Parquet sink); append is the
native file-append mode. The reference's ``float_format="%.9f"`` is
reproduced by formatting float columns explicitly — CSV is a text
format, so the engine controls the digits, not the writer's locale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mission_data_pipeline_spark.operators.dataset import to_wide


def _format_floats(df: DataFrame, digits: int) -> DataFrame:
    fmt = f"%.{digits}f"
    exprs = []
    for f in df.schema.fields:
        if isinstance(f.dataType, (T.DoubleType, T.FloatType)):
            exprs.append(
                F.when(
                    F.col(f.name).isNotNull(),
                    F.format_string(fmt, F.col(f.name)),
                ).alias(f.name)
            )
        else:
            exprs.append(F.col(f.name))
    return df.select(*exprs)


def write_csv_per_parameter(
    params: DataFrame,
    out_dir: str,
    *,
    overwrite: bool = True,
    float_digits: int = 9,
) -> None:
    """L6: tidy samples as CSV, one ``name=<param>/`` directory each."""
    (
        _format_floats(params, float_digits)
        .write.mode("overwrite" if overwrite else "append")
        .option("header", True)
        .partitionBy("name")
        .csv(out_dir)
    )


def write_csv_wide(
    params: DataFrame,
    out_path: str,
    *,
    overwrite: bool = True,
    float_digits: int = 9,
) -> None:
    """L7: single wide CSV, one column per parameter."""
    (
        _format_floats(to_wide(params), float_digits)
        .write.mode("overwrite" if overwrite else "append")
        .option("header", True)
        .csv(out_path)
    )
