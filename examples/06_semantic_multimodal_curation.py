"""Example 06 — semantic + segment dedup and multimodal decode.

No reference counterpart (the reference is telemetry-only). Three
round-6 capabilities composed into one curation pass, each in its
100 TB shape:

  1. SemDeDup-style SEMANTIC dedup over the embeddings table: nearest-
     centroid assignment against a broadcast codebook (map-side), cosine
     pairs generated within clusters only (never corpus x corpus),
     connected-component groups, min-id survivor.
  2. C4/RefinedWeb-style SEGMENT dedup over the documents table: every
     repeated 10-token segment keeps only its first occurrence and the
     documents are reassembled from survivors (boilerplate removal).
  3. REAL multimodal decode with zero codec libraries: synthesized
     baseline JPEGs + PNGs are entropy-decoded back to pixels
     (functions/jpeg.py, functions/multimodal.py) through Arrow-batched
     mapInPandas, and corrupt payloads surface as null sentinels, never
     task failures.

Run from the repo root::

    python examples/06_semantic_multimodal_curation.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
from pyspark.sql import functions as F

from mission_data_pipeline_spark import get_spark
from mission_data_pipeline_spark.functions.jpeg import encode_jpeg
from mission_data_pipeline_spark.functions.multimodal import (
    encode_png,
    image_pixel_stats,
)
from mission_data_pipeline_spark.operators.dedup import dedup_exact_segments
from mission_data_pipeline_spark.operators.similarity import (
    default_centroids,
    semantic_dedup,
)

SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark(master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")

    # 1. semantic dedup on the embedding column ------------------------
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n_vec = emb.count()
    cents = default_centroids(emb, n_centroids=8)
    kept = semantic_dedup(emb, cents, threshold=0.35)
    n_kept = kept.count()
    print(f"[semantic] {n_vec} vectors -> {n_kept} semantic survivors")

    # 2. segment-level boilerplate removal -----------------------------
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    boiler = "common boiler plate header line repeated across many documents x"
    docs = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.lit(boiler + " "), F.col("text")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    clean = dedup_exact_segments(docs, seg_tokens=10)
    removed = clean.agg(
        F.sum(F.col("n_segs") - F.col("n_kept")).alias("n_removed")
    ).first()["n_removed"]
    print(f"[segments] removed {removed} duplicate segments across the corpus")
    assert removed > 0  # the injected boilerplate must collapse

    # 3. real multimodal decode (PNG + baseline JPEG, no codec libs) ---
    rows = []
    for i in range(24):
        px = np.full((16, 16, 3), ((i * 37) % 256, 80, 160), dtype=np.uint8)
        payload = (
            encode_png(px) if i % 2 == 0 else encode_jpeg(px, quality=85)
        )
        if i % 8 == 7:
            payload = payload[: len(payload) // 2]  # corrupt on purpose
        rows.append((i, bytearray(payload)))
    media = spark.createDataFrame(rows, "item_id long, payload binary")
    stats = image_pixel_stats(media)
    ok = stats.filter(F.col("px_mean").isNotNull()).count()
    bad = stats.filter(F.col("px_mean").isNull()).count()
    print(f"[multimodal] decoded {ok} images, {bad} corrupt sentinels")
    assert ok == 21 and bad == 3

    print("SUCCESS")
    spark.stop()


if __name__ == "__main__":
    main()
