"""Data-quality profiling and constraint validation (Deequ/TFDV-style).

Before a corpus feeds training (or telemetry feeds analysis), pipelines
gate on data-quality checks: column completeness, key uniqueness, value
ranges, accepted-value sets. The reference has no such surface; at
100 TB these run as ONE aggregation pass over the table — every metric
below is a map-side-combinable aggregate, so profiling costs one scan
regardless of how many columns/checks are requested.

- :func:`profile_columns` — per-column statistics (count, nulls,
  distinct, min/max) as one row per column.
- :func:`validate_constraints` — declarative checks evaluated into a
  pass/fail report with the measured metric, so a gate can both branch
  and log *why*.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, columns: list[str]) -> DataFrame:
    """One profiling pass: ``(col_name, n_rows, n_null, n_distinct,
    min_value, max_value)`` per requested column, min/max rendered as
    strings so heterogeneous column types share one report schema.

    Exactly one aggregation job over the table — the per-column
    aggregates all ride the same scan (COUNT/MIN/MAX are partial-agg;
    exact COUNT(DISTINCT) over many columns expands to one
    expand-based aggregate, still a single pass; swap in
    approx_count_distinct for corpora where exact distinct is too hot).
    """
    if not columns:
        raise ValueError("profile_columns needs at least one column")
    missing = [c for c in columns if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in DataFrame: {missing}")
    aggs: list[Column] = [F.count("*").alias("__n")]
    for c in columns:
        aggs += [
            F.count(c).alias(f"__nn_{c}"),
            F.count_distinct(c).alias(f"__nd_{c}"),
            F.min(c).cast("string").alias(f"__mn_{c}"),
            F.max(c).cast("string").alias(f"__mx_{c}"),
        ]
    row = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"__nn_{c}")).alias("n_null"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__mn_{c}").alias("min_value"),
                F.col(f"__mx_{c}").alias("max_value"),
            )
            for c in columns
        ]
    )
    return row.select(F.explode(per_col).alias("p")).select("p.*")


@dataclass(frozen=True)
class Constraint:
    """One declarative check. ``kind`` is one of:

    - ``unique``: no value of ``column`` occurs twice (nulls ignored)
    - ``complete``: ``column`` has no nulls
    - ``min_fraction_complete``: null fraction of ``column`` <= 1-value
    - ``between``: every non-null ``column`` value in [lo, hi]
    - ``accepted_values``: every non-null value is in ``values``
    """

    kind: str
    column: str
    lo: float | None = None
    hi: float | None = None
    values: tuple = ()
    min_fraction: float | None = None

    def __post_init__(self) -> None:
        kinds = {
            "unique",
            "complete",
            "min_fraction_complete",
            "between",
            "accepted_values",
        }
        if self.kind not in kinds:
            raise ValueError(f"unknown constraint kind {self.kind!r}")
        if self.kind == "between" and (self.lo is None or self.hi is None):
            raise ValueError("between needs lo and hi")
        if self.kind == "accepted_values" and not self.values:
            raise ValueError("accepted_values needs a value set")
        if self.kind == "min_fraction_complete" and self.min_fraction is None:
            raise ValueError("min_fraction_complete needs min_fraction")


def validate_constraints(
    df: DataFrame, constraints: list[Constraint]
) -> DataFrame:
    """Evaluate every constraint in ONE aggregation pass, returning
    ``(check, column, metric, threshold, passed)`` — the measured
    violation count (or null fraction) alongside the verdict, so a
    failing gate reports what it saw, not just that it failed.

    Every check compiles to a conditional-count aggregate (uniqueness
    is ``count - count_distinct``); the report is checks-sized, the
    cost is one table scan.
    """
    if not constraints:
        raise ValueError("validate_constraints needs at least one constraint")
    aggs: list[Column] = [F.count("*").alias("__n")]
    for i, c in enumerate(constraints):
        col = F.col(c.column)
        if c.kind == "unique":
            aggs.append(
                (F.count(col) - F.count_distinct(col))
                .cast("double")
                .alias(f"__m{i}")
            )
        elif c.kind in ("complete", "min_fraction_complete"):
            # Guard 0/0: under Spark 4's ANSI mode an empty input would
            # crash the gate with DIVIDE_BY_ZERO instead of reporting.
            # An empty table has no incomplete rows → fraction 0 → pass
            # (emptiness itself is a row-count constraint, not a
            # completeness one).
            aggs.append(
                F.when(
                    F.count("*") > 0,
                    (F.count("*") - F.count(col)) / F.count("*"),
                )
                .otherwise(F.lit(0.0))
                .cast("double")
                .alias(f"__m{i}")
            )
        elif c.kind == "between":
            aggs.append(
                F.count_if((col < F.lit(c.lo)) | (col > F.lit(c.hi)))
                .cast("double")
                .alias(f"__m{i}")
            )
        else:  # accepted_values
            aggs.append(
                F.count_if(
                    col.isNotNull() & ~col.isin(*[F.lit(v) for v in c.values])
                )
                .cast("double")
                .alias(f"__m{i}")
            )
    row = df.agg(*aggs)
    reports = []
    for i, c in enumerate(constraints):
        metric = F.col(f"__m{i}")
        if c.kind == "min_fraction_complete":
            threshold = float(1.0 - c.min_fraction)
            passed = metric <= F.lit(threshold)
        else:
            threshold = 0.0
            passed = metric <= F.lit(0.0)
        reports.append(
            F.struct(
                F.lit(c.kind).alias("check"),
                F.lit(c.column).alias("column"),
                F.round(metric, 9).alias("metric"),
                F.lit(threshold).alias("threshold"),
                passed.alias("passed"),
            )
        )
    return row.select(F.explode(F.array(*reports)).alias("r")).select("r.*")
