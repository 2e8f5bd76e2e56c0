"""Example 05 — embedding similarity search, three index strategies.

No reference counterpart (the reference is telemetry-only); this walks
the X3 surface over an embedding column the way a retrieval/dedup
pipeline would use it, with every strategy sharing one output shape
(query_id, neighbor_id, score, rank):

  1. Read the embeddings table and L2-normalize (so L2 order == cosine
     order — required before PQ).
  2. Exact brute-force cosine top-k — the ground truth (one corpus
     scan, Arrow-batched matmul, no join).
  3. IVF: coarse-partition the corpus by nearest centroid, probe only
     the closest partitions per query.
  4. Product quantization: 64x-compressed codes, ADC shortlist, exact
     re-rank of the shortlist only.
  5. Grade both approximations with the recall gauge against the exact
     result — the tuning loop (n_probe / shortlist vs recall) a real
     deployment runs before committing an index choice.

Run from the repo root::

    python examples/05_similarity_search.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from mission_data_pipeline_spark import get_spark
from mission_data_pipeline_spark.operators.similarity import (
    ann_recall,
    cosine_topk,
    default_centroids,
    ivf_topk,
    pq_encode,
    pq_topk_rerank,
    pq_train_codebooks,
)

SF_DIR = "/root/testdata/sf0.001"
K = 5


def main() -> None:
    spark = get_spark(master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    n = emb.count()
    # 1. Normalize: PQ approximates L2; on unit vectors L2 order is
    # cosine order, so all three strategies rank the same metric.
    norm = F.sqrt(
        F.aggregate(
            F.transform("v", lambda x: x * x), F.lit(0.0), lambda a, b: a + b
        )
    )
    nemb = emb.select("vec_id", F.transform("v", lambda x: x / norm).alias("v"))
    queries = nemb.filter(F.col("vec_id") < 5)
    print(f"[read] {n} vectors; {queries.count()} queries, k={K}")

    # 2. Exact ground truth.
    exact = cosine_topk(emb, emb.filter(F.col("vec_id") < 5), k=K,
                        vec_col="v", round_digits=6)
    print(f"[exact] brute-force cosine: {exact.count()} result rows")

    # 3. IVF — probe 8 of 16 coarse partitions.
    cents = default_centroids(nemb, n_centroids=16, vec_col="v")
    ivf = ivf_topk(nemb, queries, k=K, n_probe=8, centroids=cents, vec_col="v")
    r_ivf = ann_recall(ivf, exact, k=K).agg(
        (F.sum("n_hit") / F.sum("n_exact")).alias("r")
    ).first()["r"]
    print(f"[ivf] n_probe=8/16 -> recall@{K} = {r_ivf:.2f}")

    # 4. PQ — 8 subspaces x 16 codes, shortlist 10% of the corpus,
    # exact re-rank of the shortlist only.
    books = pq_train_codebooks(nemb, m=8, k=16, vec_col="v",
                               sample_n=1024, n_iter=8)
    codes = pq_encode(nemb, books, vec_col="v")
    pq = pq_topk_rerank(codes, nemb, queries, books, k=K,
                        shortlist=max(50, n // 10), vec_col="v")
    r_pq = ann_recall(pq, exact, k=K).agg(
        (F.sum("n_hit") / F.sum("n_exact")).alias("r")
    ).first()["r"]
    print(f"[pq] m=8 k=16 + re-rank -> recall@{K} = {r_pq:.2f}")

    if not (r_ivf > 0 and r_pq > 0):
        raise SystemExit("recall collapsed — index pipeline broken")
    print("SUCCESS")


if __name__ == "__main__":
    main()
