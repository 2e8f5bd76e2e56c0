"""Skew mitigation for heavy-hitter keys (SURVEY §7.3 item 6).

Telemetry groupings are naturally skewed: a fast housekeeping APID can
emit 1000x the packets of a payload APID, and `groupBy("name")` over
params_df concentrates whole parameters on single reducers. Spark
already covers much of this — map-side partial aggregation for
algebraic aggregates, AQE skew-join splitting for sort-merge joins —
so these helpers target the two gaps:

- **holistic aggregates** (exact distinct counts, collect-style
  accumulations) where a single hot key funnels every row to one task;
- **explicit two-phase salted aggregation** for pipelines that need a
  deterministic plan shape independent of AQE runtime decisions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["two_phase_distinct_count", "salted_agg"]


def two_phase_distinct_count(
    df: DataFrame, keys: list[str], col: str, alias: str = "n_distinct"
) -> DataFrame:
    """Exact COUNT(DISTINCT col) per key without a skewed shuffle.

    ``groupBy(keys).agg(countDistinct(col))`` shuffles every row of a
    hot key to one reducer. Rewriting as dedup-then-count shuffles by
    (keys, col) — the hot key's rows spread across the cluster in phase
    one, and phase two only moves one row per distinct value.
    """
    return (
        df.select(*keys, col)
        .distinct()
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias(alias))
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partial: dict[str, Column],
    merge: dict[str, Column],
    *,
    n_salts: int = 16,
    salt_on: str | None = None,
) -> DataFrame:
    """Two-phase aggregation with an explicit salt on the first shuffle.

    Phase 1 groups by (keys, salt) — a hot key's rows split across
    ``n_salts`` reducers; phase 2 merges the ``n_salts`` partials per
    key. The caller supplies both phases because only they know the
    merge algebra: e.g. ``partial={"s": sum(x), "c": count(x)}``,
    ``merge={"s": sum("s"), "c": sum("c")}`` then ``avg = s/c``.

    The salt is ``pmod(hash(salt_on), n_salts)`` (deterministic) or
    ``pmod(hash(monotonically_increasing_id()), n_salts)`` when no
    natural spreading column exists.
    """
    if salt_on is not None:
        salt = F.pmod(F.hash(F.col(salt_on)), F.lit(n_salts))
    else:
        salt = F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salts))
    phase1 = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*[c.alias(name) for name, c in partial.items()])
    )
    return phase1.groupBy(*keys).agg(
        *[c.alias(name) for name, c in merge.items()]
    )
