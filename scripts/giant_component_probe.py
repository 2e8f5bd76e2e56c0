"""Giant-component stress probe for the components-based dedup family
(VERDICT r09 item 2).

Every current oracle fixture has small duplicate clusters; real crawl
pair graphs are power-law with one component holding a large fraction
of all duplicates. This probe builds that adversarial shape — a single
hub-skewed component with N_GIANT nodes (every 4th node attaches
directly to the hub, the rest to a uniform-random earlier node, so one
node carries ~N/4 of all edges) plus N_SMALL/2 two-node clusters — and
measures:

- ``connected_components`` fixpoint rounds + wall (path-halving should
  hold rounds at O(log diameter) ~ 6-8 even at millions of nodes);
- ``quality_dedup`` end-to-end wall on the same graph, with the keeper
  set verified against an independently computed argmax (the
  representative selection is two map-side-combinable partial
  aggregates, so the mega-component must NOT funnel through one task).

Results are recorded in BASELINE.md §round 10. Usage:

    python scripts/giant_component_probe.py [--giant N] [--small N]
"""

from __future__ import annotations

import argparse
import sys
import time

from pyspark.sql import functions as F


def build_graph(spark, n_giant: int, n_small: int):
    """(pairs, docs): hub-skewed giant component over nodes
    [0, n_giant) + 2-node clusters over [10**9, 10**9 + n_small).
    Pure Spark expressions — deterministic, no driver-side data."""
    giant = spark.range(1, n_giant).select(
        F.col("id").alias("doc_a"),
        F.when(F.col("id") % 4 == 0, F.lit(0).cast("long"))
        .otherwise(F.pmod(F.xxhash64(F.col("id")), F.col("id")))
        .alias("doc_b"),
    )
    base = 10**9
    small = spark.range(0, n_small // 2).select(
        (F.col("id") * 2 + base).alias("doc_a"),
        (F.col("id") * 2 + base + 1).alias("doc_b"),
    )
    pairs = giant.unionByName(small)
    nodes = spark.range(0, n_giant).unionByName(
        spark.range(base, base + n_small)
    )
    docs = nodes.select(
        F.col("id").alias("doc_id"),
        F.pmod(F.xxhash64(F.col("id") * 7 + 13), F.lit(1000)).alias(
            "quality"
        ),
    )
    return pairs, docs


def expected_keepers(docs, n_giant: int):
    """Independent argmax reference: component membership is known by
    construction (node < n_giant -> giant; else its 2-node pair)."""
    base = 10**9
    labeled = docs.select(
        "doc_id",
        "quality",
        F.when(F.col("doc_id") < n_giant, F.lit(0).cast("long"))
        .otherwise(
            base + F.floor((F.col("doc_id") - base) / 2) * 2
        )
        .alias("cid"),
    )
    qmax = labeled.groupBy("cid").agg(F.max("quality").alias("qm"))
    return (
        labeled.join(qmax, "cid")
        .filter(F.col("quality") == F.col("qm"))
        .groupBy("cid")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--giant", type=int, default=1_000_000)
    ap.add_argument("--small", type=int, default=1_000_000)
    args = ap.parse_args()

    sys.path.insert(0, ".")
    from mission_data_pipeline_spark import get_spark
    from mission_data_pipeline_spark.operators.dedup import (
        connected_components,
        quality_dedup,
    )

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    pairs, docs = build_graph(spark, args.giant, args.small)

    stats: dict = {}
    t0 = time.monotonic()
    comp = connected_components(pairs, stats=stats)
    giant_labels = (
        comp.filter(F.col("node") < args.giant)
        .select("component_id")
        .distinct()
        .collect()
    )
    cc_wall = time.monotonic() - t0
    assert [r["component_id"] for r in giant_labels] == [0], giant_labels
    n_comp = comp.select("component_id").distinct().count()
    assert n_comp == 1 + args.small // 2, n_comp

    t0 = time.monotonic()
    kept = quality_dedup(docs, pairs, quality_col="quality")
    mismatch = (
        kept.select("doc_id")
        .exceptAll(expected_keepers(docs, args.giant))
        .unionByName(
            expected_keepers(docs, args.giant).exceptAll(
                kept.select("doc_id")
            )
        )
        .count()
    )
    qd_wall = time.monotonic() - t0
    assert mismatch == 0, f"{mismatch} keeper mismatches"

    print(
        f"giant={args.giant} small={args.small} "
        f"rounds={stats['rounds']} cc_wall={cc_wall:.1f}s "
        f"quality_dedup_wall={qd_wall:.1f}s exact=True"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
