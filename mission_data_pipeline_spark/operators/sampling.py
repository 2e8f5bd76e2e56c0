"""Deterministic sampling for corpus curation — SURVEY §2.11 X-ops.

Training-data curation needs *reproducible* samples: the same corpus,
seed, and parameters must select the same rows on any cluster layout,
which rules out partition-order-dependent ``df.sample``. Both operators
here key off a seeded md5 of caller-named key columns, so membership is
a pure function of row content (and expressible in the DuckDB oracle).

- :func:`hash_sample` — keep rows whose seeded 32-bit hash bucket falls
  below the target fraction. Map-side filter only: no shuffle, no sort,
  scales to any corpus size; the fraction is approximate (binomial
  around the target) exactly like Bernoulli sampling.
- :func:`stratified_sample` — exact n per stratum: rank rows inside
  each stratum by seeded hash and keep the first n. One shuffle on the
  strata columns + a per-stratum top-n sort; for gigantic strata
  prefer :func:`hash_sample` per stratum (two-pass: count strata, pick
  per-stratum fractions) — exact-n requires a per-stratum order by
  construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _seeded_hash(key_cols: list[str], seed: int) -> Column:
    """32-bit uniform bucket from a seeded md5 over the key columns."""
    tag = F.md5(
        F.concat_ws(
            "|", F.lit(str(seed)), *[F.col(c).cast("string") for c in key_cols]
        )
    )
    return F.conv(F.substring(tag, 1, 8), 16, 10).cast("long")


def hash_sample(
    df: DataFrame, fraction: float, *, key_cols: list[str], seed: int = 0
) -> DataFrame:
    """Reproducible ~``fraction`` sample, map-side only (no shuffle)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    threshold = int(fraction * (1 << 32))
    return df.filter(_seeded_hash(key_cols, seed) < F.lit(threshold))


def stratified_sample(
    df: DataFrame,
    n_per_stratum: int,
    *,
    strata_cols: list[str],
    key_cols: list[str],
    seed: int = 0,
) -> DataFrame:
    """Exactly ``min(n, |stratum|)`` rows per stratum, seeded-hash ranked.

    The hash order makes the pick uniform within each stratum and
    independent of physical row order; ``key_cols`` breaks hash ties so
    the result is total-order deterministic.
    """
    if n_per_stratum < 1:
        raise ValueError(f"n_per_stratum must be >= 1, got {n_per_stratum}")
    w = Window.partitionBy(*strata_cols).orderBy(
        _seeded_hash(key_cols, seed), *[F.col(c) for c in key_cols]
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n_per_stratum)
        .drop("__rk")
    )
