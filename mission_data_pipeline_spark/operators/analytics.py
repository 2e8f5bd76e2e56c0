"""Event-sequence analytics: funnels and retention cohorts.

Classic product/telemetry sequence analyses expressed as pure
DataFrame aggregation chains (SURVEY §2.5 A*/W+ extensions — the
reference aggregates single events; these measure ordered behavior
across events).

Scale shape: every stage is a (user-keyed) groupBy or join on the key
the previous stage already hashed on — the event table is scanned once
per funnel stage with a pushed-down event-type filter, and nothing is
ever collected driver-side. Timestamps stay integer microseconds, so
results are exactly reproducible across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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

    Implementation: stage 1 is a filtered min-ts groupBy; each later
    stage joins the previous stage's per-user frontier time and takes
    the min qualifying ts. All joins are equi-joins on the user key;
    with u users and k stages the cost is k filtered scans + k
    user-keyed shuffles, independent of per-user event counts beyond
    the scan itself.
    """
    if len(stages) < 2:
        raise ValueError("funnel needs at least two stages")
    if len(set(stages)) != len(stages):
        raise ValueError(f"stages must be distinct, got {stages}")
    uid = F.col(user_col)
    frontier = (
        events.filter(F.col(type_col) == stages[0])
        .groupBy(uid.alias("user_id"))
        .agg(F.min(ts_col).alias("t"))
    )
    reached = [frontier]
    for stage in stages[1:]:
        frontier = (
            events.filter(F.col(type_col) == stage)
            .select(uid.alias("user_id"), F.col(ts_col).alias("__ts"))
            .join(frontier.select("user_id", "t"), "user_id")
            .filter(F.col("__ts") > F.col("t"))
            .groupBy("user_id")
            .agg(F.min("__ts").alias("t"))
        )
        reached.append(frontier)
    out = events.select(uid.alias("user_id")).distinct()
    depth = F.lit(0)
    for i, r in enumerate(reached):
        out = out.join(
            r.select("user_id", F.lit(True).alias(f"__s{i}")), "user_id", "left"
        )
        depth = F.when(F.col(f"__s{i}"), i + 1).otherwise(depth)
    return out.select("user_id", depth.alias("funnel_depth"))


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
