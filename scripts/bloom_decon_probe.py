"""A/B the two decontamination shapes at scale (BASELINE.md evidence).

``decontaminate`` (exact join) distinct-shuffles the CORPUS gram table
before joining the broadcast benchmark grams — cost grows with corpus
shuffle volume. ``bloom_decontaminate`` folds the benchmark into a
broadcast bitset and gates the corpus with a pure map-side expression —
zero corpus-side shuffle at any size. This probe times both (noop
sink, best-of-1 on a quiet box — report alongside shuffle bytes, which
are layout-deterministic) and reports the shuffle write bytes each
plan incurs, at whatever sf directory is passed.

Usage: python scripts/bloom_decon_probe.py [--sf /tmp/sfx1] [--m 22]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from mission_data_pipeline_spark import get_spark
from mission_data_pipeline_spark.operators.text import (
    bloom_decontaminate,
    decontaminate,
)


def _shuffle_write_bytes(spark) -> int:
    """Total shuffle write bytes across completed stages (same private
    AppStatusStore surface bench.py's _shuffle_snapshot uses)."""
    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()
    jvm, gw = sc._jvm, sc._gateway
    stages = store.stageList(
        jvm.java.util.ArrayList(),
        False,
        False,
        gw.new_array(jvm.double, 0),
        jvm.java.util.ArrayList(),
    )
    total = 0
    it = stages.iterator()
    while it.hasNext():
        s = it.next()
        if str(s.status()) == "COMPLETE":
            total += s.shuffleWriteBytes()
    return total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/tmp/sfx1")
    ap.add_argument("--m", type=int, default=22, help="log2 filter bits")
    args = ap.parse_args()

    spark = get_spark(master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{args.sf}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 20 != 0)
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    # warm the text scans so neither arm pays the cold-read tax
    corpus.select(F.sum(F.length("text"))).collect()
    bench.select(F.sum(F.length("text"))).collect()

    results = {}
    for name, build in (
        (
            "bloom_gate",
            lambda: bloom_decontaminate(
                corpus, bench, n=8, m_bits=1 << args.m, k=2
            ).select("doc_id", "n_bloom_grams"),
        ),
        (
            "exact_join",
            lambda: decontaminate(corpus, bench, n=8).select(
                "doc_id", "n_contaminated_grams"
            ),
        ),
    ):
        # best-of-2: the first run of each arm carries its codegen
        # compile; the second is the steady state a pipeline sees
        wall, bytes_ = None, None
        for _ in range(2):
            b0 = _shuffle_write_bytes(spark)
            t0 = time.monotonic()
            build().write.format("noop").mode("overwrite").save()
            w = time.monotonic() - t0
            b = _shuffle_write_bytes(spark) - b0
            if wall is None or w < wall:
                wall, bytes_ = w, b
        results[name] = (wall, bytes_)
        print(f"{name}: {wall:.1f} s, shuffle write {bytes_ / 1e6:.1f} MB")

    bw, bb = results["bloom_gate"]
    ew, eb = results["exact_join"]
    print(
        f"SUMMARY sf={args.sf}: bloom {bw:.1f}s/{bb/1e6:.0f}MB vs "
        f"exact {ew:.1f}s/{eb/1e6:.0f}MB "
        f"(speedup {ew / bw:.2f}x, shuffle ratio "
        f"{eb / max(bb, 1):.0f}x)"
    )


if __name__ == "__main__":
    main()
