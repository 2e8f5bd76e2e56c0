"""Temporal joins Spark lacks natively: as-of join and banded range join.

Motivated by the reference's time-series domain (parameter samples vs
calibration epochs, packet streams vs ground contacts — the reference
itself only ever joins via dict lookups, ``src/mdp/plugins/transformers/
calibration.py:81-89``), these are the two classic time-series joins a
telemetry engine needs at scale.

Both are built from shuffle-once primitives:

- ``asof_join`` — the union + ordered-window trick: tag both inputs,
  union them, and let ``last(..., ignorenulls=True)`` over a
  (keys, time)-ordered window carry the most recent right-side row onto
  each left row. ONE shuffle (the window sort), no range explosion, no
  per-key skew beyond the data's own. This is how you join 100 TB of
  samples to their governing calibration without a cross product.
- ``range_join`` — band-bucketing: hash right rows to time buckets of
  the band width, explode each left row to its two candidate buckets,
  equi-join on (keys, bucket), then apply the exact interval predicate.
  Turns an inequality join (cross-product under naive planners) into an
  equi-join with 2x fan-out, which Spark executes as a plain shuffle
  join; AQE handles residual skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    by: list[str] | None = None,
    direction: str = "backward",
    tolerance: float | int | None = None,
    right_prefix: str = "right_",
) -> DataFrame:
    """For each left row, attach the nearest right row at-or-before it.

    ``direction='backward'`` (default): nearest right row with
    ``right.on <= left.on``; ``'forward'``: nearest with ``>=``.
    ``by``: equality keys (e.g. the parameter name / spacecraft id).
    ``tolerance``: maximum |left.on - right.on|; matches farther than
    this come back null (pandas ``merge_asof`` semantics).

    Output: every left row + the matched right row's non-key columns,
    renamed ``{right_prefix}{col}`` (including ``{right_prefix}{on}``).
    Ties on ``right.on`` break toward the larger value of the last
    payload column ordering; make right unique per (by, on) for fully
    deterministic output.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by = list(by or [])
    payload = [c for c in right.columns if c not in by and c != on]

    # Right rows fold their payload into one struct (so one window
    # expression carries the whole row); left rows carry null.
    r_struct = F.struct(F.col(on).alias(on), *[F.col(c) for c in payload])
    rt = right.select(
        *by,
        F.col(on).alias("__t"),
        F.lit(0).alias("__side"),
        r_struct.alias("__r"),
    )
    lt = left.select(
        "*",
        F.col(on).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(rt.schema["__r"].dataType).alias("__r"),
    )
    # Align column sets for the union: left keeps all its columns; right
    # rows carry nulls for left-only columns.
    left_only = [c for c in left.columns if c not in by]
    rt_full = rt.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_only],
        *by,
        "__t",
        "__side",
        "__r",
    ).select(*lt.columns)

    u = lt.unionByName(rt_full)

    if direction == "backward":
        # right rows sort before left rows at equal time → inclusive match
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col("__t").asc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = F.last("__r", ignorenulls=True).over(w)
    else:
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col("__t").desc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = F.last("__r", ignorenulls=True).over(w)

    matched = u.withColumn("__m", carried).filter(F.col("__side") == 1)

    if tolerance is not None:
        dt = F.abs(F.col("__t") - F.col("__m")[on])
        matched = matched.withColumn(
            "__m", F.when(dt <= F.lit(tolerance), F.col("__m"))
        )

    out_cols: list[Column] = [F.col(c) for c in left.columns]
    out_cols.append(F.col("__m")[on].alias(f"{right_prefix}{on}"))
    out_cols.extend(F.col("__m")[c].alias(f"{right_prefix}{c}") for c in payload)
    return matched.select(*out_cols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    by: list[str] | None = None,
    lower: float | int = 0,
    upper: float | int = 0,
    right_prefix: str = "right_",
) -> DataFrame:
    """Interval join: pairs where ``right.on - left.on`` ∈ [lower, upper].

    Implemented as a banded equi-join (see module docstring): band width
    = ``upper - lower``; right rows land in bucket ``floor(on / band)``,
    each left row probes the two buckets its window can overlap. The
    exact predicate filters the ≤2x candidate set. Equal column names are
    disambiguated with ``right_prefix``.
    """
    if upper <= lower:
        raise ValueError("range_join needs upper > lower")
    by = list(by or [])
    band = upper - lower

    r_cols = [c for c in right.columns if c not in by]
    rt = right.select(
        *by,
        *[F.col(c).alias(f"{right_prefix}{c}") for c in r_cols],
        F.floor(F.col(on) / F.lit(band)).cast("long").alias("__bucket"),
    )
    # left row's admissible right times span (on+lower, on+upper]:
    # that window overlaps exactly buckets floor((on+lower)/band) and
    # floor((on+upper)/band).
    lo_b = F.floor((F.col(on) + F.lit(lower)) / F.lit(band)).cast("long")
    hi_b = F.floor((F.col(on) + F.lit(upper)) / F.lit(band)).cast("long")
    lt = left.select(
        "*", F.explode(F.array_distinct(F.array(lo_b, hi_b))).alias("__bucket")
    )

    joined = lt.join(rt, on=by + ["__bucket"], how="inner")
    dt = F.col(f"{right_prefix}{on}") - F.col(on)
    return joined.filter((dt >= F.lit(lower)) & (dt <= F.lit(upper))).drop("__bucket")
