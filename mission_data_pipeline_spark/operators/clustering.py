"""Distributed Lloyd k-means over an embedding column.

The trained-index counterpart to ``operators/similarity.py``: IVF
partitioning, SemDeDup semantic dedup, and PQ codebooks all start from
k-means centroids. The variants there train on a driver-side SAMPLE
(bounded collect); this module is the full distributed Lloyd iteration
for when the centroids themselves must be trained on the whole corpus —
the standard "train the coarse quantizer on everything" step of a
web-scale embedding index build.

Scale shape per iteration (the textbook one):
- **assignment is pure map-side** — the k centroids are collected to the
  driver (k x dim doubles, bounded by construction) and embedded in the
  plan as literal arrays, the DataFrame equivalent of a broadcast; each
  row computes its argmin with a sequential fold over dims, no join, no
  shuffle;
- **update is one partial-agg shuffle** — ``posexplode`` to
  (cluster, dim, component), groupBy with map-side combine; k*dim result
  rows come back to the driver.

Determinism (the oracle contract): float addition is not commutative,
so a naive ``SUM(double)`` centroid update depends on partition order.
Components are instead quantized once to integers
(``FLOOR(component * 1e6)`` — exact for any IEEE input, identical in
every engine) and summed as BIGINT, which IS commutative-exact; the new
centroid is ``sum / count / 1e6`` in fixed division order. Distances
fold ``(x - c)^2`` terms sequentially over dims (both engines evaluate
the same IEEE ops in the same order). The result is bit-reproducible by
a chained-CTE SQL replay: same assignments, same centroids, same
inertia, at any partitioning and any scale. Quantization bias (<=1e-6
per component) is irrelevant to clustering quality and is the point —
it buys exact distributed reproducibility, which float means cannot
give.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["kmeans_lloyd"]

_Q = 1_000_000  # component quantization: 6 decimal digits


def _quantize(x: float) -> float:
    return float(math.floor(float(x) * _Q)) / 1000000.0


def _dist_expr(vec_col: str, centroid: list[float]):
    """Sequential-fold squared L2 distance to one literal centroid:
    aggregate(zip_with(vec, c, (x,y) -> (x-y)*(x-y)), 0.0, +) — the
    same op order a SQL oracle's list fold replays."""
    c = F.array(*[F.lit(float(v)) for v in centroid])
    diff2 = F.zip_with(
        F.col(vec_col).cast("array<double>"),
        c,
        lambda x, y: (x - y) * (x - y),
    )
    return F.aggregate(
        diff2, F.lit(0.0), lambda acc, t: acc + t
    )


def _assign(df: DataFrame, id_col: str, vec_col: str, centroids: dict[int, list[float]]) -> DataFrame:
    """Map-side argmin over the literal centroids; ties -> smallest
    cluster id (struct min falls through dist to cid)."""
    cands = F.array(
        *[
            F.struct(
                _dist_expr(vec_col, c).alias("dist"),
                F.lit(int(j)).alias("cid"),
            )
            for j, c in sorted(centroids.items())
        ]
    )
    best = F.array_min(cands)
    return df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        best["cid"].alias("cluster"),
        best["dist"].alias("dist"),
    )


def kmeans_lloyd(
    df: DataFrame,
    *,
    k: int,
    n_iter: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, dict[int, list[float]]]:
    """Full-corpus Lloyd k-means. Returns ``(assignments, centroids)``:
    assignments ``(id, cluster, dist)`` under the FINAL centroids, and
    the final centroids keyed by cluster id 0..k-1.

    Initialization is deterministic: the k rows with the smallest
    ``id_col`` (quantized). Each of the ``n_iter`` rounds assigns every
    row map-side and recomputes centroids with the commutative-exact
    quantized sum (module docstring); a cluster that goes empty keeps
    its previous centroid. Driver traffic per round is k rows down
    (literal arrays) and k*dim rows up — independent of corpus size.
    """
    if k < 1 or n_iter < 1:
        raise ValueError("kmeans_lloyd needs k >= 1 and n_iter >= 1")
    init_rows = (
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
        .orderBy("id")
        .limit(k)
        .collect()
    )
    if len(init_rows) < k:
        raise ValueError(f"k={k} but only {len(init_rows)} input rows")
    centroids = {
        j: [_quantize(x) for x in row["vec"]]
        for j, row in enumerate(init_rows)
    }
    qint = F.floor(F.col("comp") * F.lit(float(_Q))).cast("long")
    for _ in range(n_iter):
        assigned = _assign(df, id_col, vec_col, centroids)
        sums = (
            assigned.select(
                "cluster", F.posexplode(F.col("vec").cast("array<double>"))
            )
            .withColumnsRenamed({"pos": "dim", "col": "comp"})
            .groupBy("cluster", "dim")
            .agg(F.sum(qint).alias("s"), F.count("*").alias("n"))
            .collect()  # bounded: k * dim rows
        )
        new: dict[int, list[float]] = {}
        for row in sums:
            comps = new.setdefault(
                int(row["cluster"]), [0.0] * len(centroids[0])
            )
            # fixed division order, replayed identically by the oracle
            comps[int(row["dim"])] = (
                float(row["s"]) / float(row["n"]) / 1000000.0
            )
        centroids = {
            j: new.get(j, centroids[j]) for j in range(k)
        }  # empty cluster keeps its previous centroid
    return _assign(df, id_col, vec_col, centroids), centroids
