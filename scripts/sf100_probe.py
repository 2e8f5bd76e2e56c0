"""sf100 scale probe (VERDICT r09 item 6): one-off walls for the
scale-critical paths at ~1000x the driver gate's data (/tmp/sfx100 —
~20M docs / 2M vectors / 600M lineitem rows), looking for the next
cliff beyond the sf10 anchor (candidate cliffs named in the verdict:
the BPE distinct-vocab collect, the components fixpoint round count,
prototype_prune's rank window).

Walls only — exactness at this scale is covered by the sf1 oracle
sweep (the oracle slices are mostly SF-invariant; the full-corpus
operators are layout-invariance-swept instead). Results recorded in
BASELINE.md §round 10.

Usage: python scripts/sf100_probe.py [--sf /tmp/sfx100] [names...]
"""

from __future__ import annotations

import argparse
import sys
import time

DEFAULT = [
    "x2_substring_dedup",
    "x2_substring_dedup_bpe",
    "curation_quality_dedup",
    "x3_prototype_prune",
    "q5_bucketed_broadcast_dims",
    "curation_filter_threshold_sweep",
    "curation_token_budget_select",
    "curation_domain_cap",
    "x2_near_dedup_compacted_index",
    "near_dedup_cap_probe",  # custom probe, see _near_dedup_cap_probe
]


def _near_dedup_cap_probe(spark, sf_dir: str) -> None:
    """Capped near-dedup growth probe (VERDICT r11 item 3): candidate-
    row count + e2e wall for near_dedup_minhash(max_bucket=50) over the
    documents table, the way r10 probed ExactSubstr. Sub-quadratic
    growth shows up as candidate rows ~linear in corpus docs (the cap
    bounds per-bucket pairs at min(m², m·50)/2); a quadratic regression
    would blow the candidate count long before the wall.

    Runs with hash_grams=True — the production shape: at sfx100 (5M
    docs, ~590M distinct grams) the string-gram distinct+verify
    shuffles overran this box's disk; 8-byte gram hashes are the
    documented at-scale fix (operators/dedup.py shingles), with
    Jaccard unchanged up to 64-bit collisions."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.dedup import (
        band_signatures,
        lsh_pairs_from_bands,
        minhash_signatures,
        near_dedup_minhash,
        shingles,
    )

    docs = spark.table("documents").select("doc_id", "text")
    n_docs = docs.count()
    t0 = time.monotonic()
    banded = band_signatures(
        minhash_signatures(
            shingles(docs, n=3, hash_grams=True), num_hashes=16
        ),
        bands=4,
    )
    cand = lsh_pairs_from_bands(banded, max_bucket=50).count()
    t_cand = time.monotonic() - t0
    t0 = time.monotonic()
    survivors = near_dedup_minhash(
        docs,
        n=3,
        num_hashes=16,
        bands=4,
        threshold=0.8,
        max_bucket=50,
        hash_grams=True,
    ).count()
    t_e2e = time.monotonic() - t0
    print(
        f"near_dedup_cap_probe: docs={n_docs} candidates={cand} "
        f"cand_per_doc={cand / max(n_docs, 1):.2f} "
        f"candidates_wall={t_cand:.1f}s e2e_wall={t_e2e:.1f}s "
        f"survivors={survivors}",
        flush=True,
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/tmp/sfx100")
    ap.add_argument("names", nargs="*", default=None)
    args = ap.parse_args()
    names = args.names or DEFAULT

    sys.path.insert(0, ".")
    from mission_data_pipeline_spark import get_spark
    from mission_data_pipeline_spark.plans.queries import (
        QUERIES,
        register_views,
    )

    spark = get_spark(app_name="mdps-sf100-probe")
    spark.sparkContext.setLogLevel("ERROR")
    register_views(spark, args.sf)
    spark.table("lineitem").groupBy("l_returnflag").count().count()  # warm

    for name in names:
        if name == "near_dedup_cap_probe":
            _near_dedup_cap_probe(spark, args.sf)
            continue
        t0 = time.monotonic()
        QUERIES[name].spark(spark, args.sf).write.mode("overwrite").format(
            "noop"
        ).save()
        print(f"{name}: {time.monotonic() - t0:.1f}s", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
