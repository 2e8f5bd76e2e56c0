"""Limit monitoring: set ``out_of_limit`` / ``alarm_level`` on params_df.

The reference's parameter model carries ``out_of_limit: bool`` and
``alarm_level: int`` (0–3) on every sample
(``src/mdp/models/parameter.py:26-56``) but ships no stage that sets
them — decom initializes both to nominal. This operator completes the
domain loop: a per-parameter limit definition (warn/critical low+high
bounds, any side optional) is checked against ``eng_value`` and the two
fields are populated.

Alarm levels: 0 nominal, 1 warning (outside warn band), 3 critical
(outside critical band) — level 2 is reserved for user-defined bands,
matching the model's 0–3 range. ``out_of_limit = alarm_level > 0``.

Same two-path shape as calibration (``operators/calibration.py``):
plan-time config lists constant-fold into a literal CASE dispatch inside
whole-stage codegen; DataFrame limit tables broadcast-hash left join.
Neither path shuffles the fact side, so limit checking composes with
decom/calibration into a single map-side stage at any scale.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

__all__ = ["LimitDefinition", "limit_table", "apply_limits"]


@dataclass(frozen=True)
class LimitDefinition:
    """Limit bands for one parameter; any bound may be None (unchecked)."""

    parameter: str
    warn_low: float | None = None
    warn_high: float | None = None
    crit_low: float | None = None
    crit_high: float | None = None

    def __post_init__(self) -> None:
        lows = [x for x in (self.crit_low, self.warn_low) if x is not None]
        highs = [x for x in (self.warn_high, self.crit_high) if x is not None]
        if lows + highs != sorted(lows + highs):
            raise ValueError(
                f"limits for {self.parameter!r} must satisfy "
                "crit_low <= warn_low <= warn_high <= crit_high"
            )


def limit_table(spark: SparkSession, limits: list[LimitDefinition]) -> DataFrame:
    rows = [
        {
            "name": d.parameter,
            "lim_warn_low": d.warn_low,
            "lim_warn_high": d.warn_high,
            "lim_crit_low": d.crit_low,
            "lim_crit_high": d.crit_high,
        }
        for d in limits
    ]
    return spark.createDataFrame(
        rows,
        schema=(
            "name string, lim_warn_low double, lim_warn_high double, "
            "lim_crit_low double, lim_crit_high double"
        ),
    )


def _level(
    val: Column,
    warn_low: Column,
    warn_high: Column,
    crit_low: Column,
    crit_high: Column,
) -> Column:
    """Alarm level for one value against (possibly null) bounds.

    A null bound never trips; a null value is nominal (validity is a
    separate concern carried by the ``validity`` column).
    """
    crit = (crit_low.isNotNull() & (val < crit_low)) | (
        crit_high.isNotNull() & (val > crit_high)
    )
    warn = (warn_low.isNotNull() & (val < warn_low)) | (
        warn_high.isNotNull() & (val > warn_high)
    )
    return (
        F.when(val.isNull(), F.lit(0))
        .when(crit, F.lit(3))
        .when(warn, F.lit(1))
        .otherwise(F.lit(0))
    )


def _fill_defaults(params: DataFrame) -> DataFrame:
    for col, typ in (("out_of_limit", "boolean"), ("alarm_level", "int")):
        if col not in params.columns:
            params = params.withColumn(col, F.lit(None).cast(typ))
    return params


def apply_limits(
    params: DataFrame,
    limits: list[LimitDefinition] | DataFrame,
    *,
    value_col: str = "eng_value",
) -> DataFrame:
    """Populate ``out_of_limit`` / ``alarm_level`` from limit definitions.

    Parameters without a limit entry keep their existing values
    (left-join semantics, mirroring calibration's touch-only-configured
    contract). First entry wins on duplicate names in the list path.

    Both paths agree on two edge cases: a definition whose bounds are
    ALL None defines no check and leaves the parameter untouched, and a
    null ``eng_value`` on a checked parameter preserves any prior alarm
    state rather than resetting it to nominal (validity is a separate
    concern; an alarm must not clear on a data gap).
    """
    params = _fill_defaults(params)
    if isinstance(limits, list):
        return _apply_literal(params, limits, value_col)
    return _apply_join(params, limits, value_col)


def _apply_literal(
    params: DataFrame, limits: list[LimitDefinition], value_col: str
) -> DataFrame:
    # All-None-bounds definitions define no check (mirror _apply_join's
    # has_limit, where an all-null row keeps existing values).
    limits = [
        d
        for d in limits
        if any(
            b is not None for b in (d.warn_low, d.warn_high, d.crit_low, d.crit_high)
        )
    ]
    if not limits:
        return params
    val = F.col(value_col).cast("double")
    w_level = None
    for d in limits:
        cond = F.col("name") == d.parameter

        def _b(x: float | None) -> Column:
            return F.lit(x).cast("double")

        lv = _level(val, _b(d.warn_low), _b(d.warn_high), _b(d.crit_low), _b(d.crit_high))
        w_level = (w_level.when if w_level is not None else F.when)(cond, lv)
    matched = F.col("name").isin([d.parameter for d in limits]) & val.isNotNull()
    return params.withColumn(
        "alarm_level",
        F.when(matched, w_level).otherwise(F.col("alarm_level")),
    ).withColumn(
        "out_of_limit",
        F.when(matched, F.col("alarm_level") > 0).otherwise(F.col("out_of_limit")),
    )


def _apply_join(params: DataFrame, limit_df: DataFrame, value_col: str) -> DataFrame:
    joined = params.join(broadcast(limit_df), on="name", how="left")
    has_limit = (
        F.col("lim_warn_low").isNotNull()
        | F.col("lim_warn_high").isNotNull()
        | F.col("lim_crit_low").isNotNull()
        | F.col("lim_crit_high").isNotNull()
    )
    val = F.col(value_col).cast("double")
    # Null values on a checked parameter keep their prior alarm state.
    checked = has_limit & val.isNotNull()
    lv = _level(
        val,
        F.col("lim_warn_low"),
        F.col("lim_warn_high"),
        F.col("lim_crit_low"),
        F.col("lim_crit_high"),
    )
    return (
        joined.withColumn(
            "alarm_level", F.when(checked, lv).otherwise(F.col("alarm_level"))
        )
        .withColumn(
            "out_of_limit",
            F.when(checked, lv > 0).otherwise(F.col("out_of_limit")),
        )
        .drop("lim_warn_low", "lim_warn_high", "lim_crit_low", "lim_crit_high")
    )
