"""Example 10 — nightly crawl-ingest gate with a stored LSH index.

No reference counterpart (the reference is telemetry-only). The
round-9 production-dedup path, composed the way a crawl team runs it
nightly:

  1. Build the corpus's near-dedup index ONCE
     (``write_near_dedup_index``): LSH band signatures to parquet
     partitioned by band, plus the gram sets the exact-Jaccard verify
     step joins, plus a params.json so mismatched probes fail loudly.
  2. Gate an incoming batch against the STORED index
     (``incremental_near_dedup(corpus_bands=, corpus_grams=)``) — the
     corpus text is never re-featurized; shuffle is proportional to
     the batch and its band collisions, never batch × corpus.
  3. Run the same gate as a STREAMING job (``near_dedup_ingest_stream``):
     micro-batches of arriving documents are gated via foreachBatch,
     survivors land under per-epoch idempotent directories, and each
     epoch's survivors extend the index as deltas — a near-dup of a
     doc accepted two batches ago is caught too.

Run from the repo root::

    python examples/10_streaming_ingest_gate.py
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from mission_data_pipeline_spark import get_spark
from mission_data_pipeline_spark.operators.dedup import (
    incremental_near_dedup,
    read_near_dedup_index,
    write_near_dedup_index,
)
from mission_data_pipeline_spark.streaming.ingest import (
    near_dedup_ingest_stream,
)

SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark(master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="mdps_example10_")
    try:
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        corpus = docs.filter(F.col("doc_id") < 80).select("doc_id", "text")

        # 1. Materialize the index (the nightly corpus-side cost).
        idx = f"{work}/index"
        write_near_dedup_index(corpus, idx, n=2, num_hashes=8, bands=4)
        bands_df, grams_df = read_near_dedup_index(
            spark, idx, n=2, num_hashes=8, bands=4
        )
        print(
            f"[index] {bands_df.count()} band rows, "
            f"{grams_df.count()} gram rows materialized"
        )

        # 2. One-shot batch gate: 10 near-copies (appended tails) must
        # drop, 10 genuinely new docs must survive.
        near = docs.filter(F.col("doc_id") < 10).select(
            (F.col("doc_id") + 50_000).alias("doc_id"),
            F.concat("text", F.lit(" tail tokens tacked on")).alias("text"),
        )
        fresh = docs.filter(
            (F.col("doc_id") >= 100) & (F.col("doc_id") < 110)
        ).select((F.col("doc_id") + 60_000).alias("doc_id"), "text")
        batch = near.unionByName(fresh)
        kept = incremental_near_dedup(
            batch,
            n=2,
            num_hashes=8,
            bands=4,
            threshold=0.6,
            corpus_bands=bands_df,
            corpus_grams=grams_df,
        )
        kept_ids = sorted(r["doc_id"] for r in kept.collect())
        print(f"[batch gate] {len(kept_ids)}/20 survived (near-copies dropped)")
        assert all(i >= 60_000 for i in kept_ids) and len(kept_ids) == 10

        # 3. Streaming: two micro-batch files; the second contains a
        # near-copy of a doc ACCEPTED in the first (caught only by the
        # per-epoch index delta, not the base index).
        src = Path(work) / "src"
        src.mkdir()
        new_a = "unrelated fresh content with tokens nobody used before today"
        new_b = "another brand new document mentioning satellites weather and maps"
        (src / "f0.json").write_text(
            json.dumps({"doc_id": 1000, "text": new_a}) + "\n"
        )
        (src / "f1.json").write_text(
            json.dumps({"doc_id": 1001, "text": new_a + " extra"})  # near-dup of 1000
            + "\n"
            + json.dumps({"doc_id": 1002, "text": new_b})
            + "\n"
        )
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )
        q = near_dedup_ingest_stream(
            stream,
            idx,
            f"{work}/out",
            checkpoint=f"{work}/ckpt",
            n=2,
            num_hashes=8,
            bands=4,
            threshold=0.6,
            # Production guard: a restart-coalesced batch containing one
            # viral page many times must not quadratic the intra-batch
            # LSH join — buckets above the cap pair star-wise against
            # their min-id representative (identical clusters for true
            # duplicate groups; see lsh_pairs_from_bands).
            max_bucket=64,
        )
        q.awaitTermination(120)
        survivors = sorted(
            r["doc_id"] for r in spark.read.parquet(f"{work}/out").collect()
        )
        print(f"[stream gate] survivors: {survivors}")
        assert survivors == [1000, 1002]  # 1001 caught by the epoch-0 delta
        print("SUCCESS")
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
