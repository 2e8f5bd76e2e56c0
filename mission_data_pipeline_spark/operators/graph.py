"""Link-analysis operators — PageRank over an edge DataFrame.

Complements ``operators/dedup.py:connected_components`` (duplicate
clustering) with the other classic iterative graph primitive: rank
propagation, used in curation pipelines to weight documents by
citation/link structure (e.g. harmonic-centrality / PageRank corpus
weighting in web-scale training-data pipelines).

Scale shape per iteration: ranks ⋈ edges on ``src`` (both sides hash on
the join key), contributions groupBy ``dst`` (map-side partial), plus
one broadcast one-row frame for the dangling-mass total — the classic
join-agg PageRank, O(edges) shuffle per iteration, no driver-side graph.
Lineage is truncated each round (same discipline as connected_components;
an unflattened 10-iteration plan re-executes the whole chain at every
action) — ``localCheckpoint`` locally, reliable ``checkpoint_dir`` on a
cluster (``operators/lineage.py``).

Determinism: per-edge contributions are rounded to 12 decimals and
summed as DECIMAL(30,12) — float addition order across partitions would
otherwise flip low bits and break exact oracle comparison. The same
round-then-exact-sum sequence is reproducible in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    *,
    n_iter: int = 10,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint: bool = True,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank. Returns ``(node, rank)`` for every node
    appearing as source or destination; ranks sum to ~1.

    Dangling nodes (no out-edges) redistribute their mass uniformly —
    the standard stochastic-matrix completion, without which total rank
    leaks every iteration. Duplicate edges count once per occurrence
    (a multigraph; pre-``distinct`` the edges for simple-graph
    semantics). ``checkpoint=False`` keeps full lineage (tests only).

    ``checkpoint_dir=None`` truncates lineage via ``localCheckpoint``
    (executor-local, NOT fault-tolerant); on a real cluster pass a
    reliable dir (HDFS/S3A) so executor loss mid-iteration recovers
    from checkpoint files (see ``operators/lineage.py``).
    """
    from mission_data_pipeline_spark.operators.lineage import make_truncator

    trunc = make_truncator(checkpoint_dir)
    if n_iter < 1:
        raise ValueError("pagerank needs n_iter >= 1")
    if not (0.0 < damping < 1.0):
        raise ValueError("damping must be in (0, 1)")
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    if checkpoint:
        nodes = trunc(nodes)
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    # out-degree rides on the node table so each iteration joins
    # ranks⋈edges only once; deg=null marks dangling nodes
    base = nodes.join(deg, nodes.node == deg.src, "left").select(
        "node", "deg"
    )
    if checkpoint:
        base = trunc(base)
    n_total = base.agg(F.count("*").alias("n"))
    ranks = base.crossJoin(F.broadcast(n_total)).select(
        "node",
        "deg",
        F.round(F.lit(1.0) / F.col("n"), 12).alias("rank"),
        "n",
    )
    dec = "decimal(30,12)"
    for _ in range(n_iter):
        # mass arriving over edges: rank/deg per out-edge, exact-sum
        contrib = (
            ranks.join(e, ranks.node == e.src)
            .select(
                "dst",
                F.round(F.col("rank") / F.col("deg"), 12)
                .cast(dec)
                .alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("mass"))
        )
        # dangling mass redistributes uniformly
        dangling = ranks.filter(F.col("deg").isNull()).agg(
            F.coalesce(
                F.sum(F.col("rank").cast(dec)), F.lit(0).cast(dec)
            ).alias("dmass")
        )
        ranks = (
            ranks.join(contrib, ranks.node == contrib.dst, "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                "deg",
                F.round(
                    (1.0 - damping) / F.col("n")
                    + damping
                    * (
                        F.coalesce(F.col("mass").cast("double"), F.lit(0.0))
                        + F.col("dmass").cast("double") / F.col("n")
                    ),
                    12,
                ).alias("rank"),
                "n",
            )
        )
        if checkpoint:
            ranks = trunc(ranks)
    return ranks.select("node", "rank")
