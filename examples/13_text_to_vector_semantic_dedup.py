"""Example 13 — text→vector bridge feeding semantic curation, end to end.

No reference counterpart (the reference is telemetry-only). Real
corpora arrive as TEXT; the semantic operators (semantic_dedup,
cosine_topk, ivf_topk) consume VECTORS. ``embed_text_hashed`` closes
that gap entirely in-engine — signed hashed TF-IDF folded to a dense
unit vector, no external embedding model, deterministic and
SQL-replayable — so the full path

    documents → vectors → semantic dedup / retrieval

is one declarative Spark plan:

  1. Derive dim-64 unit vectors for the corpus plus two PLANTED
     paraphrase-grade near-duplicates (same wording, light edits —
     the SemDeDup target class that exact/MinHash dedup can miss at
     low n-gram overlap but cosine similarity catches).
  2. ``semantic_dedup``: coarse centroids → map-side argmax assign →
     within-cluster cosine pairs only (never corpus x corpus) →
     connected-component groups → min-id canonical survivor.
  3. Retrieval check: the planted copy's nearest neighbor under
     ``cosine_topk`` must be its original, with near-1 cosine.

Run from the repo root::

    python examples/13_text_to_vector_semantic_dedup.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from mission_data_pipeline_spark import get_spark
from mission_data_pipeline_spark.operators.similarity import (
    cosine_topk,
    default_centroids,
    semantic_dedup,
)
from mission_data_pipeline_spark.operators.text import embed_text_hashed

SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark(master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")

    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.col("doc_id") < 120)
        .select("doc_id", "text")
    )
    base = {r["doc_id"]: r["text"] for r in docs.collect()}

    # Plant two paraphrase-grade near-dups of docs 3 and 7: word order
    # and a few tokens change, the term distribution barely moves — the
    # semantic-duplicate class.
    def light_edit(text: str) -> str:
        words = text.split()
        words[0], words[1] = words[1], words[0]
        return " ".join(words) + " indeed"

    planted = spark.createDataFrame(
        [(1003, light_edit(base[3])), (1007, light_edit(base[7]))],
        "doc_id long, text string",
    )
    corpus = docs.unionByName(planted)
    n_corpus = corpus.count()

    # 1. Text → dense unit vectors, entirely in-engine.
    vecs = embed_text_hashed(corpus, dim=64, seed=0)
    print(f"[embed] {vecs.count()} of {n_corpus} docs vectorized "
          "(dim=64 signed hashed TF-IDF, L2-normalized)")

    # 2. Semantic dedup over the DERIVED vectors.
    cents = default_centroids(vecs, n_centroids=8, id_col="doc_id", vec_col="v")
    survivors = semantic_dedup(
        vecs, cents, threshold=0.9, id_col="doc_id", vec_col="v"
    )
    surv_ids = {r["doc_id"] for r in survivors.select("doc_id").collect()}
    dropped = {r["doc_id"] for r in vecs.select("doc_id").collect()} - surv_ids
    print(f"[semantic dedup] dropped {sorted(dropped)} "
          f"({len(surv_ids)} survive)")
    assert 1003 in dropped and 1007 in dropped, dropped
    assert 3 in surv_ids and 7 in surv_ids  # canonical originals kept

    # 3. Retrieval: each planted copy's top neighbor is its original.
    queries = vecs.filter(F.col("doc_id").isin([1003, 1007]))
    top = cosine_topk(
        vecs, queries, k=1, id_col="doc_id", vec_col="v", round_digits=6
    )
    nn = {r["query_id"]: (r["neighbor_id"], r["cosine"]) for r in top.collect()}
    print(f"[retrieval] planted-copy nearest neighbors: {nn}")
    assert nn[1003][0] == 3 and nn[1007][0] == 7, nn
    assert nn[1003][1] > 0.9 and nn[1007][1] > 0.9

    print("SUCCESS: documents -> in-engine vectors -> semantic dedup + "
          "retrieval, one composed plan, zero model dependencies")
    spark.stop()


if __name__ == "__main__":
    main()
