"""Calibration application pass: params_df ⋈ calibration table → params_df.

Parity: reference ``src/mdp/plugins/transformers/calibration.py:75-119``:
- only parameters with a calibration entry are touched (left join);
- polynomial / table / identity methods (``:53-67``);
- samples whose raw value is non-numeric are **kept unchanged**
  (``:112-113`` — our tidy schema already separates numeric
  ``raw_value`` from ``raw_value_str``, so "non-castable" = null
  ``raw_value``);
- unit is overwritten by the calibration's unit when present
  (``:116-117``); ``calibration_id`` records the method.

Spark-first shape: the calibration dictionary becomes a **broadcast
config DataFrame** ``(name, method, coeffs, xs, ys, unit)`` and the
whole pass is one broadcast-hash left join + a method-dispatch CASE over
higher-order-function expressions. One plan serves any MIB size — the
config is data, not plan structure — and nothing shuffles the fact side.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from mission_data_pipeline_spark.functions.calibrate import (
    piecewise_from_arrays,
    polynomial_from_array,
)


@dataclass(frozen=True)
class Calibration:
    """One parameter's calibration entry (reference ``calibration.py:31-67``)."""

    parameter: str
    method: str = "identity"  # identity | polynomial | table
    coefficients: tuple[float, ...] = field(default_factory=tuple)  # low→high
    table_raw: tuple[float, ...] = field(default_factory=tuple)
    table_eng: tuple[float, ...] = field(default_factory=tuple)
    unit: str | None = None

    def __post_init__(self) -> None:
        if self.method == "table" and (
            len(self.table_raw) != len(self.table_eng) or len(self.table_raw) < 2
        ):
            raise ValueError("table calibration needs >= 2 equal-length point lists")
        if self.method not in ("identity", "polynomial", "table"):
            raise ValueError(f"unknown calibration method: {self.method}")


def calibration_table(spark: SparkSession, cals: list[Calibration]) -> DataFrame:
    rows = [
        {
            "name": c.parameter,
            "cal_method": c.method,
            "cal_coeffs": [float(x) for x in c.coefficients],
            "cal_xs": [float(x) for x in c.table_raw],
            "cal_ys": [float(x) for x in c.table_eng],
            "cal_unit": c.unit,
        }
        for c in cals
    ]
    return spark.createDataFrame(
        rows,
        schema=(
            "name string, cal_method string, cal_coeffs array<double>, "
            "cal_xs array<double>, cal_ys array<double>, cal_unit string"
        ),
    )


def apply_calibrations(params: DataFrame, cals: list[Calibration] | DataFrame) -> DataFrame:
    """Broadcast-left-join the calibration table and compute eng values."""
    if isinstance(cals, list):
        cal_df = calibration_table(params.sparkSession, cals)
    else:
        cal_df = cals

    # Tolerate partial input schemas (only name/raw_value are required):
    # missing optional columns materialize as typed nulls.
    defaults = {
        "eng_value": "double",
        "unit": "string",
        "calibration_id": "string",
    }
    for col, typ in defaults.items():
        if col not in params.columns:
            params = params.withColumn(col, F.lit(None).cast(typ))

    joined = params.join(broadcast(cal_df), on="name", how="left")
    raw = F.col("raw_value")
    calibrated = (
        F.when(F.col("cal_method") == "polynomial", polynomial_from_array(raw, F.col("cal_coeffs")))
        .when(F.col("cal_method") == "table", piecewise_from_arrays(raw, F.col("cal_xs"), F.col("cal_ys")))
        .when(F.col("cal_method") == "identity", raw)
    )
    has_cal = F.col("cal_method").isNotNull()
    # Non-numeric raw (raw_value null, value lives in raw_value_str):
    # keep sample unchanged (reference :112-113).
    applies = has_cal & raw.isNotNull()

    return (
        joined.withColumn(
            "eng_value", F.when(applies, calibrated).otherwise(F.col("eng_value"))
        )
        .withColumn(
            "unit",
            F.when(has_cal, F.coalesce(F.col("cal_unit"), F.col("unit"))).otherwise(
                F.col("unit")
            ),
        )
        .withColumn(
            "calibration_id",
            F.when(applies, F.col("cal_method")).otherwise(F.col("calibration_id")),
        )
        .drop("cal_method", "cal_coeffs", "cal_xs", "cal_ys", "cal_unit")
    )
