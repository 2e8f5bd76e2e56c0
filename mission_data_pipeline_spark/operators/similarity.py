"""Similarity search over embedding columns — SURVEY §2.11 X3.

Two paths over ``embeddings(vec_id, embedding: array<float>, label)``:

- ``cosine_topk``: exact brute force. The driver-sized query batch is
  materialized into a literal matrix; the corpus side computes all
  |queries| cosines per row in one Arrow-batched NumPy matmul, then a
  per-query top-k window. Right shape when |queries| is small — the
  corpus is scanned once, no join, no shuffle of the corpus itself,
  and the k-row-per-query result is tiny.
- ``lsh_topk``: approximate, sub-linear shuffle. Random-hyperplane LSH
  (sign sketch) buckets both sides; candidates share a bucket in at
  least one of ``tables`` sketches; exact cosine re-ranks candidates
  only. This is the 100 TB path: cost tracks collisions, not |corpus|.

Hyperplanes are generated deterministically from a seed via md5-derived
pseudo-gaussians (sum of 4 uniforms, CLT) so both sides hash
identically and the full pipeline stays reproducible in ANSI SQL for
the oracle. They are data-independent, so they are materialized ONCE on
the driver; the corpus-side sketch/assignment passes then run as ONE
Arrow-batched NumPy matmul per batch (dense linear algebra is the one
place interpreted Catalyst lambdas lose by ~13x to a vectorized Pandas
UDF — see ``_np_bucket_udf``/``_np_argmax_udf``), while tiny
query-side selections stay expression-based.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, pandas_udf
from pyspark.sql.types import ArrayType, DoubleType, IntegerType, LongType

from mission_data_pipeline_spark.functions.vectors import (
    cosine_similarity,
    l2_norm,
)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int | None = None,
    include_ties: bool = False,
) -> DataFrame:
    """Exact top-k neighbors per query: (query_id, neighbor_id, cosine, rank).

    The query batch is driver-sized by contract (same assumption the
    crossJoin-broadcast formulation made); it is materialized once —
    like the LSH planes and the IVF codebook — into a literal query
    matrix, and the corpus pass computes all |queries| cosines per row
    as ONE Arrow-batched NumPy matmul (measured 2.2x faster than the
    per-pair expression even at bench scale). No join at all: the
    corpus is scanned once, map-side, never shuffled; only the
    candidate-sized scored rows reach the per-query top-k window.

    ``round_digits`` rounds the cosine BEFORE ranking — ground-truth
    passes (ann_recall callers) use it so ties order identically in an
    ANSI-SQL oracle reproduction.

    ``include_ties=True`` ranks with RANK() semantics instead of
    ROW_NUMBER(): every neighbor whose cosine ties a row inside the
    top-k is kept, so the result is the TIE-EXTENDED admissible set —
    the correct ground truth for :func:`ann_recall(tie_aware=True)` on
    corpora with duplicate/near-clone clusters, where "the" top-k is
    ambiguous and an ANN method returning a different-but-equal
    neighbor is not a miss (r13 sfx10 probe: PQ read recall 0.505
    under row-number ground truth purely from ~100-clone ADC ties).
    """
    id_type = queries.schema[id_col].dataType.simpleString()
    qrows = queries.select(F.col(id_col), F.col(vec_col)).collect()
    if not qrows:
        return corpus.select(
            F.col(id_col).cast(id_type).alias("query_id"),
            F.col(id_col).alias("neighbor_id"),
            F.lit(0.0).alias("cosine"),
            F.lit(1).alias("rank"),
        ).limit(0)
    qpairs = sorted(
        (r[id_col], [float(x) for x in r[vec_col]]) for r in qrows
    )
    qmat = np.array([v for _, v in qpairs], dtype=np.float64)
    qnorm = np.sqrt((qmat * qmat).sum(axis=1))
    dim = qmat.shape[1]

    @pandas_udf(ArrayType(DoubleType()))
    def cos_all(v: pd.Series) -> pd.Series:
        mask, mat = _valid_matrix(v, dim)
        mnorm = np.sqrt((mat * mat).sum(axis=1))
        sims = (mat @ qmat.T) / (mnorm[:, None] * qnorm[None, :])
        if round_digits is not None:
            sims = np.round(sims, round_digits)
        out = np.full(len(v), None, dtype=object)
        # object-array intermediate: direct `out[mask] = list(sims)` would
        # re-coerce the row list to a 2-D array and fail boolean assignment
        vals = np.empty(len(mat), dtype=object)
        vals[:] = list(sims)
        out[mask] = vals
        return pd.Series(out)

    qid_lit = F.array(*[F.lit(i).cast(id_type) for i, _ in qpairs])
    scored = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.posexplode(cos_all(F.col(vec_col))).alias("__qi", "cosine"),
        )
        .select(
            F.element_at(qid_lit, F.col("__qi") + 1).alias("query_id"),
            "neighbor_id",
            "cosine",
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    if include_ties:
        # RANK(): a tie group straddling position k shares the group's
        # first position, so rank <= k keeps the whole group. The
        # neighbor_id tie-break is dropped from the ordering — it is
        # exactly what ties must NOT be split on here.
        w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc())
        rank_fn = F.rank()
    else:
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("neighbor_id")
        )
        rank_fn = F.row_number()
    return (
        scored.withColumn("rank", rank_fn.over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _pseudo_gaussian(seed: int, dim_idx: int) -> float:
    """Deterministic ~N(0,1) from (seed, dim): CLT over 4 md5-uniforms.

    Same construction the previous in-plan version computed with
    ``F.md5``/``F.conv`` — driver-side now, since the hyperplanes depend
    only on (table, bit, dim), never on data.
    """
    total = 0.0
    for rep in range(4):
        h = hashlib.md5(f"{seed}:{dim_idx}:{rep}".encode()).hexdigest()[:12]
        total += int(h, 16) / float(16**12)
    return (total - 2.0) * 1.7320508  # var(sum of 4 U) = 1/3


def _hyperplane(table: int, bit: int, dim: int) -> list[float]:
    seed = table * 1000 + bit
    return [_pseudo_gaussian(seed, i) for i in range(dim)]


def _vec_dim(df: DataFrame, vec_col: str) -> int:
    row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if row is None or row["d"] is None:
        return 0
    return int(row["d"])


def _valid_matrix(v: pd.Series, dim: int):
    """(mask, matrix) for an Arrow batch of vectors: rows that are NULL
    or the wrong width are masked out instead of crashing the batch
    (``np.vstack`` on ragged input raises). A 100 TB corpus WILL
    contain the occasional malformed row; the skip-don't-crash contract
    the sources follow applies to the vector ops too — masked rows get
    a NULL output, which downstream posexplode/equi-joins drop.
    """
    arr = v.to_numpy()
    mask = np.array(
        [x is not None and len(x) == dim for x in arr], dtype=bool
    )
    if not mask.any():
        return mask, np.empty((0, dim), dtype=np.float64)
    return mask, np.vstack(arr[mask]).astype(np.float64, copy=False)


def _np_bucket_udf(*, bits: int, tables: int, dim: int):
    """Arrow-batched LSH sketch: ``array<long>`` of per-table buckets
    (NULL for malformed vectors — see :func:`_valid_matrix`).

    The corpus-side sketch is dense linear algebra (|rows| x dim @
    dim x tables*bits), which Catalyst can only express as interpreted
    higher-order-function lambdas (~17 us per dot product — measured
    5+ s for 20k rows x 32 planes at sf1). One NumPy matmul per Arrow
    batch does the same work vectorized, ~13x faster, and stays fully
    distributed: per-batch map-side compute, no shuffle, no driver
    involvement. Bit b contributes 2^b when the dot product is
    strictly positive — same contract as the expression sketch used on
    the (tiny) query side.
    """
    planes = np.array(
        [
            _hyperplane(t, b, dim)
            for t in range(tables)
            for b in range(bits)
        ],
        dtype=np.float64,
    )  # (tables*bits) x dim
    weights = np.array([1 << b for b in range(bits)], dtype=np.int64)

    @pandas_udf(ArrayType(LongType()))
    def buckets(v: pd.Series) -> pd.Series:
        mask, mat = _valid_matrix(v, dim)
        signs = (mat @ planes.T) > 0  # n_valid x (tables*bits)
        per_table = (
            signs.reshape(len(mat), tables, bits) * weights[None, None, :]
        ).sum(axis=2)
        out = np.full(len(v), None, dtype=object)
        vals = np.empty(len(mat), dtype=object)
        vals[:] = list(per_table)
        out[mask] = vals
        return pd.Series(out)

    return buckets


def _np_argmax_udf(cents: list[tuple[int, list[float]]], *, round_digits: int = 6):
    """Arrow-batched IVF assignment: nearest-centroid id per vector
    (NULL for malformed vectors — see :func:`_valid_matrix`).

    Same vectorization rationale as :func:`_np_bucket_udf`. Semantics
    match the expression/oracle formulation exactly: similarity is
    round(cosine, round_digits) and ties break toward the LOWEST
    centroid id (``cents`` is id-sorted and ``argmax`` returns the
    first maximum).
    """
    cmat = np.array([vec for _, vec in cents], dtype=np.float64)
    cnorm = np.sqrt((cmat * cmat).sum(axis=1))
    cids = np.array([cid for cid, _ in cents], dtype=np.int64)
    dim = cmat.shape[1]

    @pandas_udf(LongType())
    def assign(v: pd.Series) -> pd.Series:
        mask, mat = _valid_matrix(v, dim)
        vnorm = np.sqrt((mat * mat).sum(axis=1))
        sims = np.round(
            (mat @ cmat.T) / (vnorm[:, None] * cnorm[None, :]), round_digits
        )
        out = np.full(len(v), None, dtype=object)
        out[mask] = cids[np.argmax(sims, axis=1)] if len(mat) else []
        return pd.Series(out, dtype=object)

    return assign


def lsh_buckets(
    df: DataFrame,
    *,
    bits: int = 8,
    tables: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """(id, table, bucket) — one row per hash table.

    All ``tables`` sketches are computed in ONE pass over the input
    (one Arrow-batched matmul + posexplode), not one scan per table:
    at 100 TB the corpus is read exactly once.
    """
    if dim is None:
        dim = _vec_dim(df, vec_col)
    buckets = _np_bucket_udf(bits=bits, tables=tables, dim=dim)
    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(buckets(F.col(vec_col))).alias("table", "bucket"),
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    bits: int = 8,
    tables: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: bucket-join candidates, exact cosine re-rank.

    Recall rises with ``tables`` and falls with ``bits``; shuffle cost is
    the candidate count. At 100 TB, corpus buckets can additionally be
    written bucketed-by(bucket) so repeated query batches co-locate.

    The bucket pass carries the vector column through, so the broadcast
    bucket join scores candidates immediately: ONE corpus scan total,
    map-side, never shuffled. A candidate colliding in several tables is
    scored once per collision and deduped by a tiny
    ``groupBy(query, neighbor)`` over identical cosines — the extra
    compute is bounded by collisions (<< corpus), while the saved
    full-corpus re-rank scan is the dominant cost at scale.

    Both sides sketch through the SAME Arrow-batched matmul UDF
    (:func:`_np_bucket_udf`), so identical vectors bucket identically
    by construction.

    Pass ``dim`` when the embedding width is known (it is, for any real
    corpus) to skip the one-row probe job that infers it.
    """
    if dim is None:
        dim = _vec_dim(corpus, vec_col)
    buckets = _np_bucket_udf(bits=bits, tables=tables, dim=dim)

    def _bucketed(df: DataFrame, out_id: str, out_vec: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(out_id),
            F.col(vec_col).alias(out_vec),
            F.posexplode(buckets(F.col(vec_col))).alias("table", "bucket"),
        )

    cb = _bucketed(corpus, "neighbor_id", "__cv")
    qb = _bucketed(queries, "query_id", "__qv")
    scored = (
        cb.join(broadcast(qb), ["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity(F.col("__qv"), F.col("__cv")).alias("cosine"),
        )
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("cosine").alias("cosine"))
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

    ``centroids`` is (centroid_id, centroid_vec) — a driver-sized model
    codebook, materialized into an Arrow-batched NumPy argmax
    (:func:`_np_argmax_udf`): pure map-side compute, no crossJoin, no
    per-id window shuffle. The assignment ranks on
    round(cosine, round_digits) with centroid_id as the tie-break,
    which makes cluster membership reproducible across engines and runs
    (an exact-float argmax is not).
    """
    cents = _centroid_literals(centroids)
    if not cents:
        raise ValueError("ivf_assign needs at least one centroid")
    np_assign = _np_argmax_udf(cents, round_digits=round_digits)
    return corpus.select(
        F.col(id_col).alias("id"),
        np_assign(F.col(vec_col)).alias("centroid_id"),
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
    oracle-checkable, and the IVF mechanics are identical either way.

    ``orderBy(...).limit(n)`` plans as a distributed TakeOrderedAndProject
    (per-partition top-n, merge n·partitions rows on one reducer) — never
    a global single-partition sort of the corpus.
    """
    return (
        corpus.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.col(id_col))
        .limit(n_centroids)
        .select(
            F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("centroid_vec")
        )
    )


def kmeans_centroids(
    corpus: DataFrame,
    *,
    n_centroids: int = 32,
    vec_col: str = "embedding",
    seed: int = 0,
    sample_fraction: float | None = None,
    max_iter: int = 20,
) -> DataFrame:
    """Learned coarse centroids via Spark ML KMeans — the IVF quality
    path (:func:`default_centroids` is the deterministic oracle-checkable
    fallback; k-means centroids give tighter partitions and better
    recall at the same n_probe).

    At 100 TB, fit on a sample (``sample_fraction`` — k-means cluster
    shapes converge long before the full corpus is seen) and reuse the
    centroids across query batches: the model's centers are k·dim
    doubles, driver-sized by construction, re-emitted as a tiny
    DataFrame for the same broadcast joins ``ivf_topk`` already does.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    data = corpus.select(
        array_to_vector(
            F.transform(F.col(vec_col), lambda x: x.cast("double"))
        ).alias("features")
    )
    if sample_fraction is not None:
        data = data.sample(fraction=sample_fraction, seed=seed)
    model = KMeans(k=n_centroids, seed=seed, maxIter=max_iter).fit(data)
    spark = corpus.sparkSession
    rows = [
        (i, [float(x) for x in center])
        for i, center in enumerate(model.clusterCenters())
    ]
    return spark.createDataFrame(
        rows, "centroid_id int, centroid_vec array<double>"
    )


def _centroid_literals(centroids: DataFrame) -> list[tuple[int, list[float]]]:
    """Materialize the centroid table driver-side, sorted by id.

    Centroids are driver-sized BY CONSTRUCTION (k·dim doubles — k-means
    and coarse-quantizer codebooks are model parameters, not data), so
    collecting them is the IVF analog of LSH's literal hyperplanes: it
    buys a zero-shuffle assignment expression for the corpus pass.
    """
    rows = centroids.select("centroid_id", "centroid_vec").collect()
    return sorted(
        (int(r["centroid_id"]), [float(x) for x in r["centroid_vec"]])
        for r in rows
    )


def _centroid_sim_array(
    vec_col: str,
    cents: list[tuple[int, list[float]]],
    *,
    norm_col: str = "__vnorm",
    round_digits: int = 6,
) -> str:
    """SQL for ``array<struct<sim, negcid>>``: round(cosine, d) of the row
    vector against every literal centroid. ``negcid`` (= -centroid_id)
    makes struct ordering break sim ties toward the LOWEST id under both
    ``array_max`` (argmax assignment) and ascending ``array_sort``
    (probe selection) — the same (sim DESC, cid ASC) order the SQL
    oracle's ROW_NUMBER uses.

    Built as ONE ``transform`` lambda over a literal centroid matrix
    (array<array<double>>) plus literal norm/id arrays — not k copied
    dot-product expressions. The expression tree stays O(k·dim literals
    + 1 lambda), so Catalyst analysis and codegen cost is paid once
    regardless of k; no join, no shuffle, no -0.0 ordering hazard
    (negation is on the int id, never on the rounded float).
    """
    import math

    matrix = ", ".join(
        "array(" + ",".join(f"{x!r}D" for x in vec) + ")" for _, vec in cents
    )
    norms = []
    for _, vec in cents:
        # same left-fold order as functions/vectors.py l2_norm, so the
        # literal norm is bit-identical to the engine-computed one
        acc = 0.0
        for x in vec:
            acc += x * x
        norms.append(math.sqrt(acc))
    norms_sql = ",".join(f"{n!r}D" for n in norms)
    negcids_sql = ",".join(f"{-cid}L" for cid, _ in cents)
    dot = (
        f"aggregate(zip_with(`{vec_col}`, element_at(array({matrix}), i + 1),"
        f" (x, p) -> x * p), 0.0D, (acc, x) -> acc + x)"
    )
    sim = (
        f"round(({dot}) / (`{norm_col}`"
        f" * element_at(array({norms_sql}), i + 1)), {round_digits})"
    )
    return (
        f"transform(sequence(0, {len(cents) - 1}), i -> named_struct("
        f"'sim', {sim},"
        f" 'negcid', element_at(array({negcids_sql}), i + 1)))"
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

    Corpus vectors are assigned to their nearest coarse centroid; each
    query probes only its ``n_probe`` nearest partitions, so scored
    candidates shrink from |corpus| to roughly ``n_probe/n_centroids``
    of it. The centroid codebook is materialized driver-side
    (:func:`_centroid_literals`) and baked into an Arrow-batched NumPy
    argmax (:func:`_np_argmax_udf`) — assignment is pure map-side
    compute with NO centroid crossJoin and NO per-id window shuffle.
    The assignment pass carries the vector column through, so the probe
    join (which broadcasts the tiny query-derived side) feeds
    re-ranking directly: the corpus is scanned exactly ONCE, map-side,
    never shuffled. At 100 TB the assignment is computed once and
    written partitioned-by(centroid_id) with the vectors; queries then
    touch only the probed partitions (partition pruning on an equi-join
    key).
    """
    if centroids is None:
        centroids = default_centroids(
            corpus, n_centroids=n_centroids, id_col=id_col, vec_col=vec_col
        )
    cents = _centroid_literals(centroids)
    if not cents:
        raise ValueError("ivf_topk needs at least one centroid")
    n_probe = min(n_probe, len(cents))

    # Corpus-side assignment is |corpus| x k dot products — dense linear
    # algebra, so it runs as one Arrow-batched NumPy matmul per batch
    # (measured ~13x faster than the interpreted HOF-lambda expression).
    # The (tiny) query-side probe selection below stays expression-based.
    np_assign = _np_argmax_udf(cents)
    assign = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        np_assign(F.col(vec_col)).alias("centroid_id"),
        F.col(vec_col).alias("__cv"),
    )

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    # Probe selection: ascending sort of (sim, negcid) structs, take the
    # LAST n_probe — the same membership set as (sim DESC, cid ASC)
    # ROW_NUMBER <= n_probe (ties at the cut resolve toward low ids in
    # both formulations).
    probe_arr = _centroid_sim_array("__qv", cents)
    probes = (
        q.withColumn("__vnorm", l2_norm(F.col("__qv")))
        .withColumn(
            "centroid_id",
            F.explode(
                F.expr(
                    f"transform(slice(array_sort({probe_arr}),"
                    f" -{n_probe}, {n_probe}), s -> -s.negcid)"
                )
            ),
        )
        .select("query_id", "centroid_id", "__qv")
    )

    # The probe side carries the query vector, so candidate selection
    # and exact re-ranking happen in the SAME broadcast join — one
    # corpus scan total, streaming map-side. Shuffling (or re-scanning)
    # the full corpus per query batch is the shape that dies at 100 TB.
    scored = (
        assign.join(broadcast(probes), "centroid_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
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


def quantize_embeddings(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Symmetric per-vector int8 scalar quantization: (id, scale, qvec).

    ``qvec[i] = round(v[i] / scale * 127)`` with ``scale = max|v[i]|``
    (dequantize as ``qvec * scale / 127``). 4× memory/shuffle reduction
    for ANN candidate generation — at 100 TB the embedding column
    dominates storage, and int8 sketches are the standard first rung
    before product quantization. Pure expression work (``transform`` /
    ``array_max``), so quantization rides inside whole-stage codegen:
    no UDF, no extra pass over the corpus.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scale = F.greatest(
        F.array_max(F.transform(v, lambda x: F.abs(x))), F.lit(1e-30)
    )
    emb = emb.withColumn("__scale", scale)
    q = F.transform(
        v, lambda x: F.round(x / F.col("__scale") * 127).cast("int")
    )
    return emb.select(
        F.col(id_col),
        *keep_cols,
        F.col("__scale").alias("scale"),
        q.alias("qvec"),
    )


def semantic_dedup(
    corpus: DataFrame,
    centroids: DataFrame,
    *,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    max_iter: int = 20,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """SemDeDup-style cluster-scoped semantic deduplication (Abbas et
    al. 2023, "SemDeDup: Data-efficient learning at web-scale through
    semantic deduplication"): drop embedding-near-duplicates, keeping
    one canonical representative (min id) per semantic group. Returns
    the surviving ``corpus`` rows unchanged.

    The scale idea is the paper's: NEVER compare the corpus to itself.
    1. Each vector is assigned to its nearest coarse centroid — an
       Arrow-batched NumPy argmax against a broadcast literal codebook
       (:func:`_np_argmax_udf`): map-side, zero shuffle.
    2. Candidate pairs are generated WITHIN clusters only (equi-join on
       ``centroid_id``), so pair volume is Σ n_c² over clusters instead
       of n² — with k ∝ corpus size, clusters stay bounded and the
       candidate step stays linear-ish. Pairs keep
       ``round(cosine, round_digits) > threshold`` (rounded so
       membership is engine- and run-reproducible).
    3. Pairs close into semantic groups via
       :func:`~mission_data_pipeline_spark.operators.dedup
       .connected_components` (path-halving min-label fixpoint,
       lineage-truncated per round; pass ``checkpoint_dir`` for
       reliable checkpoints on a real cluster).
    4. Non-canonical members (``node != component_id``) are dropped by
       a left-anti join.

    Caveat mirrored from the paper: a skewed cluster (one giant
    semantic blob) makes its within-cluster join quadratic — size the
    codebook so expected cluster size stays in the thousands, or
    pre-split hot clusters with a second-level codebook.
    """
    from mission_data_pipeline_spark.functions.vectors import cosine_similarity
    from mission_data_pipeline_spark.operators.dedup import connected_components

    cents = _centroid_literals(centroids)
    if not cents:
        raise ValueError("semantic_dedup needs at least one centroid")
    np_assign = _np_argmax_udf(cents, round_digits=round_digits)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    assigned = corpus.select(
        F.col(id_col).alias("__sd_id"),
        v.alias("__sd_v"),
        np_assign(F.col(vec_col)).alias("__sd_cid"),
    ).filter(F.col("__sd_cid").isNotNull())
    a = assigned.select(
        F.col("__sd_cid").alias("cid"),
        F.col("__sd_id").alias("id_a"),
        F.col("__sd_v").alias("va"),
    )
    b = assigned.select(
        F.col("__sd_cid").alias("cid"),
        F.col("__sd_id").alias("id_b"),
        F.col("__sd_v").alias("vb"),
    )
    pairs = (
        a.join(b, "cid")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.round(
                cosine_similarity(F.col("va"), F.col("vb")), round_digits
            )
            > threshold
        )
        .select("id_a", "id_b")
    )
    comp = connected_components(
        pairs,
        id_a="id_a",
        id_b="id_b",
        max_iter=max_iter,
        checkpoint_dir=checkpoint_dir,
    )
    dropped = comp.filter(F.col("node") != F.col("component_id")).select(
        F.col("node").alias(id_col)
    )
    return corpus.join(dropped, id_col, "left_anti")


def _np_assign_sim_udf(
    cents: list[tuple[int, list[float]]], *, round_digits: int = 6
):
    """Arrow-batched assignment WITH the winning similarity:
    ``struct<centroid_id long, sim double>`` per vector (NULL for
    malformed vectors). Same matmul/rounding/tie semantics as
    :func:`_np_argmax_udf`; used where downstream needs the
    prototypicality score, not just the partition id."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    cmat = np.array([vec for _, vec in cents], dtype=np.float64)
    cnorm = np.sqrt((cmat * cmat).sum(axis=1))
    cids = np.array([cid for cid, _ in cents], dtype=np.int64)
    dim = cmat.shape[1]
    out_t = StructType(
        [
            StructField("centroid_id", LongType()),
            StructField("sim", DoubleType()),
        ]
    )

    @pandas_udf(out_t)
    def assign(v: pd.Series) -> pd.DataFrame:
        mask, mat = _valid_matrix(v, dim)
        vnorm = np.sqrt((mat * mat).sum(axis=1))
        sims = np.round(
            (mat @ cmat.T) / (vnorm[:, None] * cnorm[None, :]), round_digits
        )
        cid_col = np.full(len(v), None, dtype=object)
        sim_col = np.full(len(v), None, dtype=object)
        if len(mat):
            arg = np.argmax(sims, axis=1)
            cid_col[mask] = cids[arg]
            sim_col[mask] = sims[np.arange(len(mat)), arg]
        return pd.DataFrame({"centroid_id": cid_col, "sim": sim_col})

    return assign


def prototype_prune(
    corpus: DataFrame,
    centroids: DataFrame,
    *,
    drop_frac: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Prototype-based data pruning (the SSL-prototypes step of D4,
    Tirumala et al. 2023; Sorscher et al. 2022 "Beyond neural scaling
    laws"): within each embedding cluster, DROP the ``drop_frac``
    fraction of points MOST similar to their centroid — the most
    prototypical points are the most redundant, and pruning them beats
    random pruning at scale (keeps the diverse/hard examples). The
    natural companion to :func:`semantic_dedup` (which removes
    near-exact semantic copies; this thins dense regions): together
    they are the published D4 pipeline.

    Per cluster of size ``n_c``, exactly ``floor(drop_frac * n_c)``
    points drop — the cluster's top-ranked by
    (round(cosine-to-centroid, round_digits) DESC, id ASC), so the
    selection is engine- and layout-reproducible. Returns the
    surviving ``corpus`` rows unchanged; malformed vectors are kept
    (they belong to no cluster — filter them upstream if unwanted).

    Scale shape: assignment + prototypicality is ONE Arrow-batched
    NumPy matmul pass against the broadcast literal codebook (map-side,
    zero shuffle); the only shuffle is the per-cluster rank window, and
    cluster sizes are bounded by codebook sizing (same contract as
    :func:`semantic_dedup`).
    """
    if not (0.0 <= drop_frac <= 1.0):
        raise ValueError(f"drop_frac must be in [0, 1], got {drop_frac}")
    from pyspark.sql import Window

    cents = _centroid_literals(centroids)
    if not cents:
        raise ValueError("prototype_prune needs at least one centroid")
    assign = _np_assign_sim_udf(cents, round_digits=round_digits)
    scored = corpus.select(
        F.col(id_col).alias("__pp_id"), assign(F.col(vec_col)).alias("__pp")
    ).filter(F.col("__pp").isNotNull())
    w = Window.partitionBy("__pp.centroid_id").orderBy(
        F.desc("__pp.sim"), F.asc("__pp_id")
    )
    wc = Window.partitionBy("__pp.centroid_id")
    dropped = (
        scored.withColumn("__rk", F.row_number().over(w))
        .withColumn("__nc", F.count("*").over(wc))
        .filter(
            F.col("__rk")
            <= F.floor(F.lit(float(drop_frac)) * F.col("__nc"))
        )
        .select(F.col("__pp_id").alias(id_col))
    )
    return corpus.join(dropped, id_col, "left_anti")


def ann_recall(
    approx: DataFrame, exact: DataFrame, *, k: int = 10,
    tie_aware: bool = False,
) -> DataFrame:
    """Recall@k of an approximate top-k result against the exact one.

    Both inputs are ``(query_id, neighbor_id, ..., rank)`` frames (the
    shared output shape of :func:`cosine_topk` / :func:`lsh_topk` /
    :func:`ivf_topk`). Returns ``(query_id, n_exact, n_hit, recall)``
    per query — the standard ANN quality gauge for tuning
    ``bits``/``tables``/``n_probe`` against a ground-truth sample.

    ``tie_aware=True`` treats ``exact`` as the TIE-EXTENDED admissible
    set (:func:`cosine_topk(include_ties=True)`): a hit is any approx
    top-k neighbor inside it, and the denominator is
    ``min(k, approx top-k size)`` (= k against any corpus with >= k
    neighbors) rather than the admissible-set size. On corpora with
    duplicate/near-clone clusters "the" top-k is ambiguous — an ANN
    method returning a different-but-cosine-equal neighbor is not a
    miss, and row-number ground truth under-reads recall by exactly the
    tie loss (r13 sfx10 probe: PQ 0.505 plain vs the tie loss being
    the whole deficit). Comparing plain vs tie-aware recall SEPARATES
    quantization error from tie ambiguity.

    The per-query key set is the UNION of both sides (r14, ADVICE r13):
    a query the ANN method missed entirely (zero approx rows) scores
    recall 0 over ``min(k, admissible-set size)`` instead of vanishing
    from the output — averaging recall over the result no longer
    overstates quality for methods that drop whole queries. Plain mode
    already reported 0 for such queries and is unchanged.

    Scale shape: ground truth is computed on a *sample* of queries
    (exact top-k is the expensive part), so both inputs are small;
    the joins are on (query_id, neighbor_id) pairs — k rows per query
    (tie-aware: k + tie-group overhang on the exact side).
    """
    a = approx.filter(F.col("rank") <= k).select("query_id", "neighbor_id")
    e = exact.filter(F.col("rank") <= k).select("query_id", "neighbor_id")
    hits = a.join(e, ["query_id", "neighbor_id"]).groupBy("query_id").agg(
        F.count("*").alias("n_hit")
    )
    if tie_aware:
        a_cnt = a.groupBy("query_id").agg(F.count("*").alias("_n_a"))
        e_cnt = e.groupBy("query_id").agg(F.count("*").alias("_n_e"))
        denom = e_cnt.join(a_cnt, "query_id", "full").select(
            "query_id",
            F.when(
                F.coalesce("_n_a", F.lit(0)) > 0,
                F.least(F.lit(k), F.col("_n_a")),
            )
            .otherwise(F.least(F.lit(k), F.col("_n_e")))
            .cast("long")
            .alias("n_exact"),
        )
    else:
        denom = e.groupBy("query_id").agg(F.count("*").alias("n_exact"))
    return denom.join(hits, "query_id", "left").select(
        "query_id",
        "n_exact",
        F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
        (
            F.coalesce("n_hit", F.lit(0)).cast("double") / F.col("n_exact")
        ).alias("recall"),
    )


def ivf_write_index(
    corpus: DataFrame,
    index_dir: str,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF index on disk: every corpus vector written
    with its coarse-centroid assignment, ``partitionBy("centroid_id")``
    — the at-rest layout the :func:`ivf_topk` docstring promises for
    100 TB. Assignment is the same zero-shuffle Arrow-batched NumPy
    argmax as the in-memory path, computed ONCE at write time; probes
    then read only their partitions (see :func:`ivf_probe_index`).
    """
    cents = _centroid_literals(centroids)
    if not cents:
        raise ValueError("ivf_write_index needs at least one centroid")
    np_assign = _np_argmax_udf(cents)
    (
        corpus.select(
            F.col(id_col),
            F.col(vec_col),
            np_assign(F.col(vec_col)).alias("centroid_id"),
        )
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(index_dir)
    )


def ivf_probe_index(
    spark,
    index_dir: str,
    queries: DataFrame,
    centroids: DataFrame,
    *,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k probe against an on-disk IVF index
    (:func:`ivf_write_index` layout): each query selects its ``n_probe``
    nearest centroids, the scan filters ``centroid_id IN (batch probe
    set)`` — a STATIC predicate on the partition column, so Spark
    prunes every unprobed partition directory before reading a byte —
    and candidate scoring + exact re-rank ride the one pruned scan via
    a broadcast of the query-derived probe side.

    The probe-set collect is query-batch-sized (``n_queries x n_probe``
    ints) by construction — the driver-side step is the IVF analog of
    the literal centroid codebook, never corpus-sized. Results are
    identical to the in-memory :func:`ivf_topk` with the same corpus,
    centroids, and parameters.
    """
    cents = _centroid_literals(centroids)
    if not cents:
        raise ValueError("ivf_probe_index needs at least one centroid")
    n_probe = min(n_probe, len(cents))
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    probe_arr = _centroid_sim_array("__qv", cents)
    probes = (
        q.withColumn("__vnorm", l2_norm(F.col("__qv")))
        .withColumn(
            "centroid_id",
            F.explode(
                F.expr(
                    f"transform(slice(array_sort({probe_arr}),"
                    f" -{n_probe}, {n_probe}), s -> -s.negcid)"
                )
            ),
        )
        .select("query_id", "centroid_id", "__qv")
    )
    probe_ids = sorted(
        r["centroid_id"]
        for r in probes.select("centroid_id").distinct().collect()
    )
    scan = spark.read.parquet(index_dir).filter(
        F.col("centroid_id").isin(probe_ids)
    )
    scored = (
        scan.join(broadcast(probes), "centroid_id")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(
                cosine_similarity(F.col("__qv"), F.col(vec_col)), 6
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


def pq_train_codebooks(
    corpus: DataFrame,
    *,
    m: int = 8,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_n: int = 2048,
    n_iter: int = 10,
):
    """Train product-quantization codebooks: ``m`` subspaces × ``k``
    centroids each (Jégou et al. 2011). Returns a ``(m, k, dim/m)``
    NumPy array — the PQ model, m·k·(dim/m) floats, driver-sized by
    construction like the LSH planes and IVF centroid codebook.

    Deterministic end to end, so the recall-bound oracle is stable:
    the training sample is the ``sample_n`` lowest-id vectors
    (TakeOrderedAndProject — per-partition top-n, never a global sort),
    initialization is the k lowest-id sample subvectors, and Lloyd
    iterations run a fixed count with min-index tie-breaks. At 100 TB
    you train on a sample regardless — subspace cluster shapes converge
    long before the corpus is seen (same argument as
    :func:`kmeans_centroids`).
    """
    rows = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.col(id_col))
        .limit(sample_n)
        .collect()
    )
    if not rows:
        raise ValueError("pq_train_codebooks: empty corpus")
    mat = np.array(
        [[float(x) for x in r[vec_col]] for r in rows], dtype=np.float64
    )
    dim = mat.shape[1]
    if dim % m:
        raise ValueError(f"m={m} must divide dim={dim}")
    dsub = dim // m
    books = np.empty((m, k, dsub), dtype=np.float64)
    for j in range(m):
        sub = mat[:, j * dsub : (j + 1) * dsub]
        cents = sub[:k].copy()
        for _ in range(n_iter):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)  # argmin: first (min-index) tie-break
            for c in range(k):
                pts = sub[assign == c]
                if len(pts):
                    cents[c] = pts.mean(axis=0)
        books[j] = cents
    return books


def pq_encode(
    corpus: DataFrame,
    codebooks,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "pq_codes",
) -> DataFrame:
    """Encode each vector as ``m`` one-byte-ish centroid indices —
    dim·8 bytes → m bytes per vector (a 64-dim float64 column compresses
    64x at m=8), the memory/shuffle footprint that lets a 100 TB
    embedding corpus fit an in-memory ANN index. One Arrow-batched
    NumPy pass; the corpus is scanned map-side, never shuffled."""
    books = np.asarray(codebooks, dtype=np.float64)
    m, _k, dsub = books.shape
    dim = m * dsub

    @pandas_udf(ArrayType(IntegerType()))
    def enc(v: pd.Series) -> pd.Series:
        mask, mat = _valid_matrix(v, dim)
        codes = np.zeros((mat.shape[0], m), dtype=np.int64)
        for j in range(m):
            sub = mat[:, j * dsub : (j + 1) * dsub]
            d2 = ((sub[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = d2.argmin(axis=1)
        out = [
            [int(c) for c in codes[i]] if mask[i] else None
            for i in range(mat.shape[0])
        ]
        return pd.Series(out)

    return corpus.select(
        F.col(id_col), enc(F.col(vec_col)).alias(out_col)
    )


def pq_topk(
    encoded: DataFrame,
    queries: DataFrame,
    codebooks,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    codes_col: str = "pq_codes",
    query_vec_col: str = "embedding",
    round_digits: int = 6,
    include_ties: bool = False,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over a PQ-encoded corpus:
    per query, a lookup table of squared distances from each query
    subvector to every subspace centroid (m·k doubles — broadcast-sized)
    turns scoring into ``m`` table gathers + a sum per corpus row. One
    Arrow-batched pass over the codes, no join, corpus never shuffles;
    only the scored candidate rows reach the per-query top-k window —
    the :func:`cosine_topk`/:func:`lsh_topk` scale shape with a 64x
    smaller corpus operand. Returns (query_id, neighbor_id, approx_d2,
    rank), rank ascending by (rounded) approximate distance.

    ``include_ties=True`` ranks with RANK() semantics over the ADC
    distance alone: an ADC tie group straddling the ``k`` cutoff is
    kept WHOLE instead of being cut arbitrarily by neighbor id. PQ
    collapses near-identical vectors to identical codes, so on corpora
    with clone clusters the boundary tie group is the rule, not the
    edge case (the r13 sfx10 finding behind the
    :func:`pq_topk_rerank` tie guard)."""
    books = np.asarray(codebooks, dtype=np.float64)
    m, kk, dsub = books.shape
    id_type = queries.schema[id_col].dataType.simpleString()
    qrows = queries.select(F.col(id_col), F.col(query_vec_col)).collect()
    if not qrows:
        return encoded.select(
            F.col(id_col).cast(id_type).alias("query_id"),
            F.col(id_col).alias("neighbor_id"),
            F.lit(0.0).alias("approx_d2"),
            F.lit(1).alias("rank"),
        ).limit(0)
    qpairs = sorted(
        (r[id_col], [float(x) for x in r[query_vec_col]]) for r in qrows
    )
    qmat = np.array([v for _, v in qpairs], dtype=np.float64)
    # LUT[q, j, c] = ||query_q[sub j] - centroid_c[sub j]||^2
    lut = np.empty((qmat.shape[0], m, kk), dtype=np.float64)
    for j in range(m):
        qs = qmat[:, j * dsub : (j + 1) * dsub]
        lut[:, j, :] = ((qs[:, None, :] - books[j][None, :, :]) ** 2).sum(
            axis=2
        )

    @pandas_udf(ArrayType(DoubleType()))
    def adc(codes: pd.Series) -> pd.Series:
        out = []
        good = [c for c in codes if c is not None and len(c) == m]
        if good:
            cmat = np.array(good, dtype=np.int64)  # (n, m)
            # dists[i, q] = sum_j lut[q, j, cmat[i, j]] — one gather per
            # subspace (m is small); each gather is (Q, n)
            dists = np.zeros((cmat.shape[0], lut.shape[0]))
            for j in range(m):
                dists += lut[:, j, cmat[:, j]].T
            dists = np.round(dists, round_digits)
        it = iter(range(len(good)))
        for c in codes:
            if c is None or len(c) != m:
                out.append(None)
            else:
                out.append([float(x) for x in dists[next(it), :]])
        return pd.Series(out)

    qid_lit = F.array(*[F.lit(q) for q, _ in qpairs])
    scored = (
        encoded.withColumn("__d", adc(F.col(codes_col)))
        .filter(F.col("__d").isNotNull())
        .select(
            F.col(id_col).alias("neighbor_id"),
            F.explode(F.arrays_zip(qid_lit.alias("q"), F.col("__d").alias("d"))).alias("z"),
        )
        .select(
            F.col("z.q").cast(id_type).alias("query_id"),
            "neighbor_id",
            F.col("z.d").alias("approx_d2"),
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    if include_ties:
        w = Window.partitionBy("query_id").orderBy(F.col("approx_d2").asc())
        ranked = scored.withColumn("rank", F.rank().over(w))
    else:
        w = Window.partitionBy("query_id").orderBy(
            F.col("approx_d2").asc(), F.col("neighbor_id").asc()
        )
        ranked = scored.withColumn("rank", F.row_number().over(w))
    return ranked.filter(F.col("rank") <= k)


def pq_topk_rerank(
    encoded: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    codebooks,
    *,
    k: int = 5,
    shortlist: int = 50,
    id_col: str = "vec_id",
    codes_col: str = "pq_codes",
    vec_col: str = "embedding",
    round_digits: int = 6,
    tie_extend: bool = True,
    max_shortlist: "int | None" = None,
) -> DataFrame:
    """Production PQ shape: ADC over the compressed codes SHORTLISTS
    ``shortlist`` candidates per query, then the original vectors of
    only those candidates are re-scored exactly (Jégou et al.'s
    IVFADC-with-re-ranking refinement). Quantization error then only
    has to keep the true neighbors inside the shortlist, not order
    them — measured recall@10 0.42 → 0.74 on the near-random test
    embeddings at shortlist=50, k=10.

    Scale shape: the ADC pass never shuffles the corpus; the shortlist
    (|queries|·shortlist rows) is BROADCAST back against the corpus for
    the vector fetch, so the full-precision vectors of non-candidates
    are never read past the scan, and the exact re-rank touches
    shortlist-sized data only. Returns (query_id, neighbor_id, d2,
    rank) by exact squared L2, ascending.

    KNOB RULE, NOW ENFORCED IN-PLAN (r13 measured, r14 guard):
    ``shortlist`` must exceed the corpus's largest NEAR-DUPLICATE
    cluster. Quantization collapses near-identical vectors to identical
    codes, so ADC ties across the whole cluster and a row-number
    shortlist smaller than it drops true neighbors arbitrarily —
    recall@10 read 0.505 at shortlist=50 on a corpus with ~100-clone
    clusters and 1.000 at shortlist=150, at the SAME wall (the re-rank
    is broadcast-sized either way). With ``tie_extend=True`` (default)
    the shortlist is cut with RANK() over the ADC distance, so a tie
    group straddling the cutoff is kept whole and the clone-cluster
    case AUTO-RECOVERS with no knob turn. The extension is bounded by
    ``max_shortlist`` (default ``8 * shortlist``): if ADC ties would
    grow any query's shortlist past it, the plan FAILS LOUDLY
    (``assert_true`` inside the candidate filter — Catalyst cannot
    prune it) instead of silently truncating — that corpus has a clone
    cluster larger than the bound, and the right fix is near-dedup
    first or an explicitly larger ``shortlist``/``max_shortlist``.
    ``tie_extend=False`` restores the bare row-number cut."""
    cand = pq_topk(
        encoded,
        queries,
        codebooks,
        k=shortlist,
        id_col=id_col,
        codes_col=codes_col,
        query_vec_col=vec_col,
        round_digits=round_digits,
        include_ties=tie_extend,
    ).select("query_id", "neighbor_id")
    if tie_extend:
        if max_shortlist is None:
            max_shortlist = 8 * shortlist
        wq = Window.partitionBy("query_id")
        overflow_msg = F.concat(
            F.lit("pq_topk_rerank: ADC ties extended query "),
            F.col("query_id").cast("string"),
            F.lit("'s shortlist to "),
            F.col("__n_cand").cast("string"),
            F.lit(
                f" candidates (> max_shortlist={max_shortlist}): the "
                "corpus has a near-duplicate cluster larger than the "
                "bound — near-dedup it first, or raise shortlist/"
                "max_shortlist (see the knob rule in pq_topk_rerank)"
            ),
        )
        cand = (
            cand.withColumn("__n_cand", F.count("*").over(wq))
            .filter(
                F.assert_true(
                    F.col("__n_cand") <= F.lit(max_shortlist), overflow_msg
                ).isNull()
            )
            .drop("__n_cand")
        )
    fetched = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__nv")
    ).join(broadcast(cand), "neighbor_id")
    qvecs = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    d2 = F.aggregate(
        F.zip_with("__nv", "__qv", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("d2").asc(), F.col("neighbor_id").asc()
    )
    return (
        fetched.join(broadcast(qvecs), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(d2, round_digits).alias("d2"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hard_negative_mining(
    corpus: DataFrame,
    anchors: DataFrame,
    *,
    k: int = 5,
    margin: "float | None" = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    round_digits: int = 6,
) -> DataFrame:
    """Contrastive-training hard-negative mining: for each anchor, the
    ``k`` most-similar corpus items with a DIFFERENT label — the
    near-the-decision-boundary negatives that make triplet/contrastive
    batches informative. Returns ``(query_id, neighbor_id,
    neighbor_label, cosine, rank, pos_cosine)`` where ``pos_cosine`` is
    the anchor's nearest SAME-label cosine (its hardest positive).

    With ``margin`` set, negatives are restricted to the SEMI-HARD band
    of Schroff et al. 2015 (FaceNet §3.2), translated to cosine:
    ``pos_cosine > cosine >= pos_cosine - margin`` — harder than "easy"
    negatives but not harder than the positive (those invert the
    gradient). Anchors without any same-label neighbor pass ``margin``
    unfiltered (pos_cosine NULL).

    Scale shape: the anchor batch is bounded by contract (same as
    cosine_topk / knn); the corpus is scanned once against the
    broadcast anchors, all-JVM expression cosines (no Python), and only
    per-anchor windows rank the scored rows. Ranking happens AFTER the
    semi-hard filter so ``rank <= k`` selects the k hardest negatives
    WITHIN the band. Cosines round before ranking (``round_digits``)
    with id tie-break, so the selection is reproducible cross-engine.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if margin is not None and margin <= 0:
        raise ValueError(f"margin must be > 0 when set, got {margin}")
    a = anchors.select(
        F.col(id_col).alias("query_id"),
        F.col(label_col).alias("query_label"),
        F.col(vec_col).alias("__qv"),
    )
    scored = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(label_col).alias("neighbor_label"),
            F.col(vec_col).alias("__v"),
        )
        .crossJoin(broadcast(a))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "query_label",
            "neighbor_id",
            "neighbor_label",
            F.round(
                cosine_similarity(F.col("__qv"), F.col("__v")),
                round_digits,
            ).alias("cosine"),
        )
    )
    wpos = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    pos = (
        scored.filter(F.col("neighbor_label") == F.col("query_label"))
        .withColumn("__rn", F.row_number().over(wpos))
        .filter(F.col("__rn") == 1)
        .select("query_id", F.col("cosine").alias("pos_cosine"))
    )
    neg = scored.filter(
        F.col("neighbor_label") != F.col("query_label")
    ).join(pos, "query_id", "left")
    if margin is not None:
        neg = neg.filter(
            F.col("pos_cosine").isNull()
            | (
                (F.col("cosine") < F.col("pos_cosine"))
                & (F.col("cosine") >= F.col("pos_cosine") - margin)
            )
        )
    wneg = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        neg.withColumn("rank", F.row_number().over(wneg))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "neighbor_label",
            "cosine",
            "rank",
            "pos_cosine",
        )
    )


def matryoshka_recall(
    corpus: DataFrame,
    anchors: DataFrame,
    *,
    k: int = 5,
    prefix_dim: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Matryoshka-truncation retrieval audit (Kusupati et al. 2022,
    Matryoshka Representation Learning): how much top-``k`` retrieval
    quality survives when embeddings are truncated to their first
    ``prefix_dim`` coordinates — the measurement that decides whether a
    64-dim index can be served from a 16-dim prefix (4× memory/ANN
    speed). Per anchor: exact top-k under FULL cosine (ground truth),
    top-k under PREFIX cosine (candidate), and
    ``recall = |overlap| / k``. Returns ``(query_id, n_hits, recall)``.

    Scale shape: the anchor batch is bounded by contract (cosine_topk /
    knn convention); ONE corpus scan computes both cosines per
    (row, anchor) — full and prefix — map-side against the broadcast
    anchors, then two per-anchor windows rank and a positional
    anti/semi count overlaps. Cosines round before ranking with id
    tie-breaks so both rankings (and thus recall) are reproducible
    cross-engine; prefix vectors are NOT re-normalized (cosine is
    scale-invariant).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if prefix_dim < 1:
        raise ValueError(f"prefix_dim must be >= 1, got {prefix_dim}")
    a = anchors.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    scored = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__v")
        )
        .crossJoin(broadcast(a))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine_similarity(F.col("__qv"), F.col("__v")),
                round_digits,
            ).alias("cos_full"),
            F.round(
                cosine_similarity(
                    F.slice("__qv", 1, prefix_dim),
                    F.slice("__v", 1, prefix_dim),
                ),
                round_digits,
            ).alias("cos_prefix"),
        )
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.col("cos_full").desc(), F.col("neighbor_id")
    )
    wp = Window.partitionBy("query_id").orderBy(
        F.col("cos_prefix").desc(), F.col("neighbor_id")
    )
    # Both ranks ride the same scored rows, so the overlap is a single
    # conjunctive filter — ONE corpus-scan lineage, not a truth/cand
    # self-join that would recompute the broadcast-cross three times.
    ranked = scored.select(
        "query_id",
        F.row_number().over(wf).alias("__rf"),
        F.row_number().over(wp).alias("__rp"),
    )
    hits = (
        ranked.filter((F.col("__rf") <= k) & (F.col("__rp") <= k))
        .groupBy("query_id")
        .agg(F.count("*").alias("n_hits"))
    )
    return a.select("query_id").join(hits, "query_id", "left").select(
        "query_id",
        F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
        F.round(
            F.coalesce("n_hits", F.lit(0)) / F.lit(float(k)), 6
        ).alias("recall"),
    )
