"""Example 03 — LLM training-corpus curation, end to end.

No reference counterpart (the reference is telemetry-only); this is the
large-scale training-data path this engine adds on top: every stage is
a zero-or-one-shuffle DataFrame transformation that scales to a
100 TB corpus unchanged.

  1. Read the documents table (driver testdata parquet).
  2. Normalize whitespace/control chars (stable dedup keys).
  3. Exact-dedup on content hash, then near-dedup survivors via
     MinHash+LSH banding.
  4. Quality gates: C4-style signals + token-length floor.
  5. Rebalance languages with temperature sampling (alpha=0.3, the
     multilingual-LM recipe).
  6. Assign reproducible train/val/test splits (seeded hash, 90/5/5).
  7. Chunk documents into model context windows.
  8. Write JSONL partitioned by split; report per-split token mass.

Run from the repo root::

    python examples/03_corpus_curation.py
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from mission_data_pipeline_spark import get_spark
from mission_data_pipeline_spark.operators.dedup import (
    exact_dedup,
    near_dedup_minhash,
)
from mission_data_pipeline_spark.operators.packing import chunk_tokens
from mission_data_pipeline_spark.operators.sampling import (
    split_assign,
    temperature_sample,
)
from mission_data_pipeline_spark.operators.text import (
    c4_signals,
    normalize_text,
)

SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark(master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_raw = docs.count()
    print(f"[read] {n_raw} raw documents")

    # 2. Normalize before hashing — dedup keys must be stable across
    # visually-identical documents.
    docs = normalize_text(docs)

    # 3. Exact then near dedup. Both shapes hold at 100 TB: hash-groupBy
    # for exact; shingle -> minhash -> banded LSH buckets -> verified
    # candidate pairs for near (no all-pairs join anywhere).
    docs = exact_dedup(docs, text_col="text", id_col="doc_id")
    docs = near_dedup_minhash(docs, n=3, num_hashes=32, bands=8, threshold=0.8)
    n_dedup = docs.count()
    print(f"[dedup] {n_dedup} survivors after exact + MinHash near-dedup")

    # 4. Quality gates ride the scan (zero shuffle). The synthetic
    # corpus has no sentence punctuation, so the terminal-punct C4 rule
    # would drop everything — gate on the word-count signal here and
    # keep the curly-brace/lorem-ipsum tells.
    passing = (
        c4_signals(docs, min_words=10)
        .filter(
            (F.col("n_words") >= 10)
            & ~F.col("has_curly_brace")
            & ~F.col("has_lorem_ipsum")
        )
        .select("doc_id")
    )
    docs = docs.join(passing, "doc_id", "left_semi")
    n_quality = docs.count()
    print(f"[quality] {n_quality} pass the gates")

    # 5. Flatten the language mixture (heads downsampled toward tails,
    # scarcest language kept whole; map-side gate, corpus never shuffles).
    docs = temperature_sample(
        docs, 0.3, group_col="lang", key_cols=["doc_id"], seed=11
    )

    # 6. Reproducible splits: membership is a pure function of
    # (doc_id, seed) — any rerun, any cluster layout, same assignment.
    docs = split_assign(
        docs, {"train": 18, "val": 1, "test": 1}, key_cols=["doc_id"], seed=3
    )

    # 7. Chunk into context windows (stride = size - overlap).
    chunks = chunk_tokens(docs, size=64, overlap=8, id_col="doc_id")

    with tempfile.TemporaryDirectory(prefix="mdps_curation_") as tmpdir:
        out_dir = Path(tmpdir) / "corpus_jsonl"
        # 8. JSONL partitioned by split — the interchange layout
        # downstream training jobs consume.
        (
            chunks.join(docs.select("doc_id", "split"), "doc_id")
            .write.partitionBy("split")
            .json(str(out_dir))
        )
        back = spark.read.json(str(out_dir))
        stats = (
            back.groupBy("split")
            .agg(
                F.count("*").alias("n_chunks"),
                F.sum("n_tokens").alias("token_mass"),
            )
            .orderBy("split")
        )
        print("\nPer-split chunk accounting:")
        stats.show()
        rows = {r["split"]: r for r in stats.collect()}
        assert set(rows) <= {"train", "val", "test"} and "train" in rows
        assert all(r["n_chunks"] > 0 for r in rows.values())

    print("SUCCESS: curation pipeline complete "
          f"({n_raw} raw -> {n_dedup} deduped -> {n_quality} quality-passed)")


if __name__ == "__main__":
    main()
