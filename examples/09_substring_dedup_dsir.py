"""Example 09 — substring-level dedup + target-distribution selection.

No reference counterpart (the reference is telemetry-only). The two
round-8 curation operators, composed the way a pretraining-data team
would actually run them:

  1. Read the documents table and plant a few partial copies (the
     synthetic corpus shares no long verbatim spans on its own).
  2. ExactSubstr dedup (Lee et al. 2022 §4.1): every 12-token span
     occurring more than once in the corpus keeps only its globally
     first occurrence — the duplicated *substring* is excised, not the
     whole document. Distributed as gram-keyed partial aggs + a
     per-doc interval merge; no suffix array, no pairwise scan.
  3. DSIR (Xie et al. 2023): score every cleaned document's hashed
     n-gram distribution against a target slice (here: the 'en'
     documents) and keep a Gumbel-resampled top-k — importance
     resampling toward the target domain.
  4. Report the funnel: tokens removed by span surgery, then the
     selected subset's size and weight range.

Every stage is expression-level DataFrame work (zero Python in the row
path) and holds its shape at 100 TB: the only shuffles are gram-keyed
and doc-keyed partial aggregations.

Run from the repo root::

    python examples/09_substring_dedup_dsir.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from mission_data_pipeline_spark import get_spark
from mission_data_pipeline_spark.operators.dedup import exact_substring_dedup
from mission_data_pipeline_spark.operators.sampling import dsir_select

SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark(master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_raw = docs.count()
    print(f"[read] {n_raw} raw documents")

    # 1. Plant partial copies: each reuses its source's first 20 tokens
    # then diverges — the classic boilerplate-prefix duplication shape.
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    copies = docs.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(
            F.array_join(F.slice(toks, 1, 20), " "),
            F.lit(" uniq"),
            F.col("doc_id").cast("string"),
            F.lit(" tail marker extra pad tokens"),
        ).alias("text"),
        F.lit("en").alias("lang"),
    )
    corpus = docs.select("doc_id", "text", "lang").unionByName(copies)

    # 2. ExactSubstr surgery at 12-token granularity.
    cleaned = exact_substring_dedup(corpus, k=12)
    surgery = cleaned.agg(
        F.sum("n_tokens").alias("tokens_in"),
        F.sum("n_removed").alias("tokens_removed"),
        F.sum(F.when(F.col("n_removed") > 0, 1).otherwise(0)).alias(
            "docs_touched"
        ),
    ).first()
    print(
        f"[exactsubstr] {surgery['tokens_removed']} of "
        f"{surgery['tokens_in']} tokens excised across "
        f"{surgery['docs_touched']} documents"
    )

    # 3. DSIR selection toward the 'en' slice, over the CLEANED text.
    cleaned_docs = cleaned.select(
        "doc_id", F.col("kept_text").alias("text")
    ).filter(F.length("text") > 0)
    target = corpus.filter(F.col("lang") == "en").select("doc_id", "text")
    selected = dsir_select(cleaned_docs, target, 20, buckets=1024, seed=7)
    rows = selected.collect()
    lo = min(r["logw"] for r in rows)
    hi = max(r["logw"] for r in rows)
    print(
        f"[dsir] selected {len(rows)} docs toward the 'en' target "
        f"(log-weight range [{lo:.3f}, {hi:.3f}])"
    )

    assert surgery["tokens_removed"] > 0 and surgery["docs_touched"] >= 10
    assert len(rows) == 20
    print("SUCCESS")


if __name__ == "__main__":
    main()
