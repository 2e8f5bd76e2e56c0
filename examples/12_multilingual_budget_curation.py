"""Example 12 — multilingual budget curation with Bloom decontamination.

No reference counterpart (the reference is telemetry-only); this
composes the round-10 curation additions into the pipeline a
multilingual pre-training run needs between "crawl survivors" and
"training mixture":

  1. Read the documents table; split off a held-out benchmark slice
     (stand-in for the eval suites a real run must not train on).
  2. Bloom-filter decontamination: fold the benchmark into a broadcast
     bitset and gate the corpus with codegen probes — the gram table
     never shuffles at any corpus size; one-sided, so nothing
     contaminated survives.
  3. Per-domain cap (RefinedWeb anti-monoculture): no source may
     contribute more than its best N documents.
  4. UniMax language balancing: water-fill a document budget across
     languages at a 1-epoch cap — low-resource languages keep
     everything, the dominant language is downsampled to the shared
     waterline.
  5. Report the mixture before/after and verify the UniMax contract.

Run from the repo root::

    python examples/12_multilingual_budget_curation.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from mission_data_pipeline_spark import get_spark
from mission_data_pipeline_spark.operators.sampling import (
    domain_cap,
    unimax_allocate,
    unimax_sample,
)
from mission_data_pipeline_spark.operators.text import bloom_decontaminate

SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark(master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    # 1. Benchmark slice = every 20th doc (stand-in for eval suites).
    corpus = docs.filter(F.col("doc_id") % 20 != 0)
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    n_raw = corpus.count()
    print(f"[read] {n_raw} corpus documents, {bench.count()} benchmark")

    # 2. Bloom decontamination: the filter is sized to the BENCHMARK
    # (constant in production), so the corpus-side gate costs the same
    # at 100 TB — codegen probes; the gram table never shuffles.
    gated = bloom_decontaminate(corpus, bench, n=8, m_bits=1 << 16, k=2)
    clean = gated.filter(~F.col("bloom_contaminated")).drop(
        "n_bloom_grams", "bloom_contaminated"
    )
    n_clean = clean.count()
    print(f"[decontaminate] {n_clean} survive the Bloom gate "
          f"({n_raw - n_clean} flagged, incl. any false positives — "
          "the gate never MISSES a real overlap)")

    # 3. Per-domain cap: best 20 per source by length, ties to crawl
    # order. One domain-keyed shuffle, per-domain rank window.
    capped = domain_cap(
        clean, cap=20, domain_col="source", quality_col="n_chars"
    ).drop("domain_rank")
    n_capped = capped.count()
    print(f"[domain cap] {n_capped} after capping each source at 20")

    # 4. UniMax: budget = 4/5 of the capped corpus, 1-epoch cap per
    # language. Allocation is closed-form integer water-filling over a
    # bounded per-language count collect.
    budget = n_capped * 4 // 5
    counts = {
        r["lang"]: r["count"]
        for r in capped.groupBy("lang").count().collect()
    }
    alloc = unimax_allocate(sorted(counts.items()), budget)
    mixture = unimax_sample(capped, budget=budget, seed=11)
    got = {
        r["lang"]: r["count"]
        for r in mixture.groupBy("lang").count().collect()
    }
    print(f"[unimax] budget {budget} over languages {sorted(counts)}")
    for lang in sorted(counts):
        tag = "saturated (kept whole)" if alloc[lang] == counts[lang] \
            else "downsampled to waterline"
        print(f"  {lang}: {counts[lang]} -> {got.get(lang, 0)}  [{tag}]")

    # 5. Contract checks: selection matches the allocation exactly,
    # total within budget, and the dominant language was downsampled
    # while at least one low-resource language saturated.
    assert got == {k: v for k, v in alloc.items() if v > 0}
    assert sum(got.values()) <= budget
    dominant = max(counts, key=counts.get)
    if budget < sum(counts.values()):
        # Only when the budget forces downsampling does the waterline
        # cut into the dominant language; a budget that covers every
        # language's cap keeps everything (no language downsampled).
        assert alloc[dominant] < counts[dominant]
    else:
        print("[unimax] budget covers the whole corpus — "
              "no downsampling needed")
    assert any(alloc[lang] == counts[lang] for lang in counts)

    print("SUCCESS: multilingual budget curation complete "
          f"({n_raw} raw -> {n_clean} clean -> {n_capped} capped -> "
          f"{sum(got.values())} in the training mixture)")


if __name__ == "__main__":
    main()
