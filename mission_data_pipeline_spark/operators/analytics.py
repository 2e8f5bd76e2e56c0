"""Event-sequence analytics: funnels and retention cohorts.

Classic product/telemetry sequence analyses expressed as pure
DataFrame aggregation chains (SURVEY §2.5 A*/W+ extensions — the
reference aggregates single events; these measure ordered behavior
across events).

Scale shape: the funnel is ONE scan and ONE user-keyed shuffle (k
stacked strict-past window mins sharing a single partitioning + sort,
the per-user aggregate reusing it — see ``funnel_depths``); retention
is one min-groupBy + one user-keyed join back. Nothing is ever
collected driver-side. Timestamps stay integer microseconds, so
results are exactly reproducible across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_depths(
    events: DataFrame,
    stages: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts_us",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel depth per user: how far each user progressed
    through ``stages``, where stage *i+1* only counts if it happened
    strictly AFTER the user's earliest qualifying stage-*i* event (the
    standard ordered-funnel semantic; an out-of-order conversion does
    not count).

    Returns ``(user_id, funnel_depth)`` for every user present in
    ``events`` — depth 0 means the user never hit ``stages[0]``.

    Implementation (round-14 single-pass shape): ONE scan and ONE
    user-keyed shuffle. The per-stage frontier chain ("min qualifying
    ts of stage i+1 strictly after the earliest qualifying stage-i
    event") is equivalent to a cumulative-window formulation — an event
    of stage i+1 qualifies iff SOME qualifying stage-i event happened
    strictly before it (the earliest one is then ≤ that witness), so a
    strict-past ``RANGE`` frame (``rangeBetween(unboundedPreceding,
    -1)`` on the numeric ts — equal timestamps are excluded, preserving
    the strictly-after tie rule the pytest pins) carries each stage's
    qualification forward. All k window mins share one partitioning +
    sort; the final per-user aggregate reuses the same partitioning, so
    the whole funnel is scan → one exchange → sort → k stacked Window
    ops → map-side-preserved aggregate. The previous shape was k
    filtered scans + k user-keyed join shuffles (7 parquet scans in the
    executed plan at k=3); this one never reads the input twice.
    """
    if len(stages) < 2:
        raise ValueError("funnel needs at least two stages")
    if len(set(stages)) != len(stages):
        raise ValueError(f"stages must be distinct, got {stages}")
    # The strict-past RANGE frame needs a NUMERIC orderBy column; a
    # TimestampType ts (supported by the pre-r14 join formulation) is
    # mapped to epoch microseconds — full precision, same strictly-
    # after tie rule. Numeric inputs pass through untouched.
    from pyspark.sql.types import TimestampType

    ts = F.col(ts_col)
    if isinstance(events.schema[ts_col].dataType, TimestampType):
        ts = F.unix_micros(ts)
    cur = events.select(
        F.col(user_col).alias("user_id"),
        ts.alias("__ts"),
        F.col(type_col).alias("__type"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("__ts")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    cur = cur.withColumn(
        "__q0", F.when(F.col("__type") == stages[0], F.col("__ts"))
    )
    for i, stage in enumerate(stages[1:], start=1):
        cur = cur.withColumn(
            f"__q{i}",
            F.when(
                (F.col("__type") == stage)
                & F.min(f"__q{i - 1}").over(w).isNotNull(),
                F.col("__ts"),
            ),
        )
    agg = cur.groupBy("user_id").agg(
        *[F.max(f"__q{i}").alias(f"__q{i}") for i in range(len(stages))]
    )
    depth = F.lit(0)
    for i in range(len(stages)):
        depth = F.when(F.col(f"__q{i}").isNotNull(), i + 1).otherwise(depth)
    return agg.select("user_id", depth.alias("funnel_depth"))


def retention_cohorts(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts_us",
    day_us: int = 86_400_000_000,
) -> DataFrame:
    """Day-grain retention triangle: users are cohorted by their first
    active day; each ``(cohort_day, day_offset)`` cell counts how many
    of that cohort were active ``day_offset`` days later (offset 0 is
    the cohort's size). Returns ``(cohort_day, day_offset, n_active)``.

    One min-groupBy for first-seen, one user-keyed join back, one
    (cohort, offset) distinct-count — the result is cohort-triangle
    sized (days²/2 rows), never corpus-sized.
    """
    # Integer division (DIV), not float `/` + cast: epoch-µs values near
    # an exact day boundary would round through double imprecision.
    day = F.expr(f"CAST(`{ts_col}` AS BIGINT) DIV {int(day_us)}")
    ev = events.select(F.col(user_col).alias("user_id"), day.alias("__day"))
    first = ev.groupBy("user_id").agg(F.min("__day").alias("__cohort"))
    return (
        ev.join(first, "user_id")
        .groupBy(
            F.col("__cohort").alias("cohort_day"),
            (F.col("__day") - F.col("__cohort")).alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
    )
