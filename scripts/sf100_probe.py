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
]


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
        t0 = time.monotonic()
        QUERIES[name].spark(spark, args.sf).write.mode("overwrite").format(
            "noop"
        ).save()
        print(f"{name}: {time.monotonic() - t0:.1f}s", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
