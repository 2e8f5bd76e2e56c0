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

import numpy as np
import pyarrow as pa
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


def _assign_expr(df: DataFrame, id_col: str, vec_col: str, centroids: dict[int, list[float]]) -> DataFrame:
    """Catalyst-expression argmin over the literal centroids; ties ->
    smallest cluster id (struct min falls through dist to cid).
    Reference semantics for :func:`_assign`; the higher-order-function
    folds run INTERPRETED (one lambda frame per element), so the
    vectorized twin below is ~3x faster at equal bits — this form is
    kept as the executable spec the tests diff against."""
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


def _assign(df: DataFrame, id_col: str, vec_col: str, centroids: dict[int, list[float]]) -> DataFrame:
    """Map-side argmin over the broadcast-literal centroids — the
    Arrow-vectorized twin of :func:`_assign_expr`, bit-identical by
    construction: per row the distance to each centroid accumulates
    ``(x_i - c_i)^2`` IN DIM ORDER from a 0.0 seed (the NumPy loop runs
    one vector op per dim, so every element sees the same IEEE op
    sequence as the sequential fold), and ``argmin`` keeps the FIRST
    minimum = smallest cluster id on ties, matching the struct-min tie
    break. NaN distances rank last (masked to +inf for the argmin,
    the NaN itself still reported), and a row whose vector is NULL,
    ragged vs the codebook, or containing NULLs falls back to a scalar
    replay of the zip_with/aggregate semantics (null-padded zip -> NULL
    distance; NULL dist sorts first, ties -> smallest cid). Still no
    Exchange: only an ArrowEvalPython over the scan.
    """
    from pyspark.sql import types as T

    ordered = sorted(centroids.items())
    cids = [int(j) for j, _ in ordered]
    C = np.array([c for _, c in ordered], dtype=np.float64)
    k, dim = C.shape

    def _fallback_row(v) -> tuple[int, "float | None"]:
        # exact replay of zip_with (null-pads the shorter side, so any
        # ragged/NULL element -> NULL distance) + the sequential
        # aggregate, over one anomalous row
        cands = []
        for j in range(k):
            if v is None:
                d = None
            else:
                d = 0.0
                for i in range(max(len(v), dim)):
                    x = v[i] if i < len(v) else None
                    if x is None or i >= dim:
                        d = None
                        break
                    d = d + (float(x) - C[j, i]) * (float(x) - C[j, i])
            cands.append((d, cids[j]))

        def _key(t):
            d, cid = t
            # struct-min ordering (probed): NULL dist first, NaN last,
            # finite by value; ties fall through to the smaller cid
            if d is None:
                return (0, 0.0, cid)
            if d != d:
                return (2, 0.0, cid)
            return (1, d, cid)

        d, cid = min(cands, key=_key)
        return cid, d

    @F.arrow_udf(
        T.StructType(
            [
                T.StructField("cluster", T.IntegerType()),
                T.StructField("dist", T.DoubleType()),
            ]
        )
    )
    def _argmin(vs: pa.Array) -> pa.Array:
        # Arrow-native (NOT pandas) so a NaN distance stays NaN on the
        # way back — the pandas path rewrites float NaN to NULL, which
        # ranks OPPOSITE (NULL dist sorts first, NaN last).
        if isinstance(vs, pa.ChunkedArray):  # defensive; batches arrive flat
            vs = vs.combine_chunks()
        n = len(vs)
        offsets = vs.offsets.to_numpy(zero_copy_only=False)
        lengths = offsets[1:] - offsets[:-1]
        values = vs.values
        clean = vs.is_valid().to_numpy(zero_copy_only=False) & (
            lengths == dim
        )
        if values.null_count:
            elem_ok = values.is_valid().to_numpy(zero_copy_only=False)
            # a row is clean only if every element in its segment is;
            # null positions outside [offsets[0], offsets[n]) belong to
            # a sliced-away region of the child and are ignored
            bad = np.flatnonzero(~elem_ok)
            for b in bad:
                hit = int(np.searchsorted(offsets[1:], b, side="right"))
                if hit < n and offsets[hit] <= b:
                    clean[hit] = False
        vnp = values.to_numpy(zero_copy_only=False)
        out_c = np.zeros(n, dtype=np.int32)
        out_d: list = [None] * n
        idx = np.flatnonzero(clean)
        if len(idx):
            m = len(idx)
            X = vnp[
                np.add.outer(offsets[:-1][idx], np.arange(dim, dtype=offsets.dtype))
            ]
            dists = np.empty((k, m))
            for j in range(k):
                acc = np.zeros(m)
                for i in range(dim):
                    d = X[:, i] - C[j, i]
                    acc = acc + d * d
                dists[j] = acc
            ranked = np.where(np.isnan(dists), np.inf, dists)
            best = np.argmin(ranked, axis=0)
            out_c[idx] = np.array(cids, dtype=np.int32)[best]
            for pos, r in enumerate(idx):
                out_d[r] = float(dists[best[pos], pos])
        for r in np.flatnonzero(~clean):
            v = vs[int(r)].as_py()
            cid, dd = _fallback_row(v)
            out_c[r] = cid
            out_d[r] = dd
        return pa.StructArray.from_arrays(
            [
                pa.array(out_c, type=pa.int32()),
                pa.array(out_d, type=pa.float64(), from_pandas=False),
            ],
            names=["cluster", "dist"],
        )

    best = _argmin(F.col(vec_col).cast("array<double>"))
    return df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        best["cluster"].alias("cluster"),
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
