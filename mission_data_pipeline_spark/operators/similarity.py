"""Similarity search over embedding columns — SURVEY §2.11 X3.

Two paths over ``embeddings(vec_id, embedding: array<float>, label)``:

- ``cosine_topk``: exact brute force. The query set is broadcast; the
  corpus side streams through a JVM-side ``zip_with``/``aggregate``
  dot product and a per-query top-k window. Right shape when
  |queries| is small — the corpus is scanned once, no shuffle of the
  corpus itself, and the k-row-per-query result is tiny.
- ``lsh_topk``: approximate, sub-linear shuffle. Random-hyperplane LSH
  (sign sketch) buckets both sides; candidates share a bucket in at
  least one of ``tables`` sketches; exact cosine re-ranks candidates
  only. This is the 100 TB path: cost tracks collisions, not |corpus|.

Hyperplanes are generated deterministically from a seed via md5-derived
pseudo-gaussians (sum of 4 uniforms, CLT) so the operator needs no
driver-side numpy state and both sides hash identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from mission_data_pipeline_spark.functions.vectors import cosine_similarity


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query: (query_id, neighbor_id, cosine, rank)."""
    q = broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
        )
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity(F.col("__qv"), F.col("__cv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _pseudo_gaussian(seed: Column, dim_idx: Column) -> Column:
    """Deterministic ~N(0,1) from (seed, dim): CLT over 4 md5-uniforms."""
    total = F.lit(0.0)
    for rep in range(4):
        u = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":",
                            seed.cast("string"),
                            dim_idx.cast("string"),
                            F.lit(str(rep)),
                        )
                    ),
                    1,
                    12,
                ),
                16,
                10,
            ).cast("double")
            / F.lit(float(16**12))
        )
        total = total + u
    return (total - F.lit(2.0)) * F.lit(1.7320508)  # var(sum of 4 U) = 1/3


def _sketch(vec: Column, *, bits: int, table: int) -> Column:
    """Sign sketch of `vec` against `bits` seeded random hyperplanes."""
    dims = F.sequence(F.lit(0), F.size(vec) - 1)
    out = F.lit(0).cast("long")
    for b in range(bits):
        seed = F.lit(table * 1000 + b)
        proj = F.aggregate(
            F.zip_with(
                vec,
                dims,
                lambda v, i: v * _pseudo_gaussian(seed, i),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        out = out + F.when(
            proj > 0, F.shiftleft(F.lit(1).cast("long"), b)
        ).otherwise(F.lit(0).cast("long"))
    return out


def lsh_buckets(
    df: DataFrame,
    *,
    bits: int = 8,
    tables: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, table, bucket) — one row per hash table."""
    rows = [
        df.select(
            F.col(id_col).alias("id"),
            F.lit(t).alias("table"),
            _sketch(F.col(vec_col), bits=bits, table=t).alias("bucket"),
        )
        for t in range(tables)
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    bits: int = 8,
    tables: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: bucket-join candidates, exact cosine re-rank.

    Recall rises with ``tables`` and falls with ``bits``; shuffle cost is
    the candidate count. At 100 TB, corpus buckets can additionally be
    written bucketed-by(bucket) so repeated query batches co-locate.
    """
    cb = lsh_buckets(corpus, bits=bits, tables=tables, id_col=id_col, vec_col=vec_col)
    qb = lsh_buckets(queries, bits=bits, tables=tables, id_col=id_col, vec_col=vec_col)
    cand = (
        qb.withColumnRenamed("id", "query_id")
        .join(cb.withColumnRenamed("id", "neighbor_id"), ["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    scored = (
        cand.join(broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity(F.col("__qv"), F.col("__cv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """(id, centroid_id): nearest centroid per vector (IVF coarse quantizer).

    ``centroids`` is (centroid_id, centroid_vec) — small, broadcast. The
    assignment ranks on round(cosine, round_digits) with centroid_id as
    the tie-break, which makes cluster membership reproducible across
    engines and runs (an exact-float argmax is not).
    """
    c = centroids.select(
        F.col("centroid_id"), F.col("centroid_vec").alias("__cv")
    )
    scored = corpus.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("__v")
    ).crossJoin(broadcast(c)).select(
        "id",
        "centroid_id",
        F.round(cosine_similarity(F.col("__v"), F.col("__cv")), round_digits).alias(
            "__sim"
        ),
    )
    w = Window.partitionBy("id").orderBy(F.col("__sim").desc(), F.col("centroid_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("id", "centroid_id")
    )


def default_centroids(
    corpus: DataFrame,
    *,
    n_centroids: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic coarse centroids: the ``n_centroids`` lowest-id
    vectors. A production pipeline would k-means these (Spark ML
    ``KMeans`` over a sample); deterministic seeds keep this operator
    oracle-checkable, and the IVF mechanics are identical either way."""
    w = Window.orderBy(F.col(id_col))
    return (
        corpus.select(F.col(id_col), F.col(vec_col))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_centroids)
        .select(
            F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("centroid_vec")
        )
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    n_probe: int = 4,
    centroids: DataFrame | None = None,
    n_centroids: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: partition-then-probe, the ANN scale path.

    Corpus vectors are assigned to their nearest coarse centroid
    (``ivf_assign``); each query probes only its ``n_probe`` nearest
    partitions, so scored candidates shrink from |corpus| to roughly
    ``n_probe/n_centroids`` of it. At 100 TB the assignment is computed
    once and written partitioned-by(centroid_id); queries then touch only
    the probed partitions (partition pruning on an equi-join key) —
    contrast with the brute-force cross join, which rescans everything
    per query batch.
    """
    if centroids is None:
        centroids = default_centroids(
            corpus, n_centroids=n_centroids, id_col=id_col, vec_col=vec_col
        )
    assign = ivf_assign(corpus, centroids, id_col=id_col, vec_col=vec_col)

    c = centroids.select("centroid_id", F.col("centroid_vec").alias("__cv"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    probe_scored = q.crossJoin(broadcast(c)).select(
        "query_id",
        "centroid_id",
        F.round(cosine_similarity(F.col("__qv"), F.col("__cv")), 6).alias("__sim"),
    )
    wp = Window.partitionBy("query_id").orderBy(
        F.col("__sim").desc(), F.col("centroid_id")
    )
    probes = (
        probe_scored.withColumn("__rn", F.row_number().over(wp))
        .filter(F.col("__rn") <= n_probe)
        .select("query_id", "centroid_id")
    )

    cand = (
        probes.join(assign, "centroid_id")
        .filter(F.col("id") != F.col("query_id"))
        .select("query_id", F.col("id").alias("neighbor_id"))
    )
    cv = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    scored = (
        cand.join(broadcast(q), "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine_similarity(F.col("__qv"), F.col("__cv")), 6
            ).alias("cosine"),
        )
    )
    wk = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
