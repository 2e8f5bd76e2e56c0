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


def _shuffle_bytes(spark, group: str) -> str:
    """Job-group-scoped shuffle read/write MB via bench.py's helpers
    (latest-attempt-per-stage, ADVICE r12)."""
    try:
        import bench

        b = bench._job_group_shuffle_bytes(spark, group)
        if b is None:
            return "n/a"
        return (
            f"read={b['read'] / 1e6:.1f}MB write={b['write'] / 1e6:.1f}MB"
        )
    except Exception as e:  # pragma: no cover - diagnostics only
        return f"n/a ({e})"


def _hash_grams_ab_probe(spark, sf_dir: str) -> None:
    """A/B: string vs 8-byte hashed gram featurization (VERDICT r12
    item 4) — candidates wall, e2e wall, and job-scoped shuffle bytes
    for the capped near-dedup path in BOTH modes at the same scale, so
    the production default for ``hash_grams`` is a measured decision
    rather than an opt-in flag nobody flips."""
    from mission_data_pipeline_spark.operators.dedup import (
        band_signatures,
        lsh_pairs_from_bands,
        minhash_signatures,
        near_dedup_minhash,
        shingles,
    )

    docs = spark.table("documents").select("doc_id", "text")
    n_docs = docs.count()
    sc = spark.sparkContext
    for mode in (False, True):
        tag = "hashed" if mode else "string"
        group = f"ab:{tag}:cand"
        sc.setJobGroup(group, group)
        t0 = time.monotonic()
        banded = band_signatures(
            minhash_signatures(
                shingles(docs, n=3, hash_grams=mode), num_hashes=16
            ),
            bands=4,
        )
        cand = lsh_pairs_from_bands(banded, max_bucket=50).count()
        t_cand = time.monotonic() - t0
        cand_bytes = _shuffle_bytes(spark, group)
        group = f"ab:{tag}:e2e"
        sc.setJobGroup(group, group)
        t0 = time.monotonic()
        surv = near_dedup_minhash(
            docs, n=3, num_hashes=16, bands=4, threshold=0.8,
            max_bucket=50, hash_grams=mode,
        ).count()
        t_e2e = time.monotonic() - t0
        e2e_bytes = _shuffle_bytes(spark, group)
        sc.setJobGroup("", "")
        print(
            f"hash_grams_ab[{tag}]: docs={n_docs} candidates={cand} "
            f"cand_wall={t_cand:.1f}s cand_shuffle[{cand_bytes}] "
            f"survivors={surv} e2e_wall={t_e2e:.1f}s "
            f"e2e_shuffle[{e2e_bytes}]",
            flush=True,
        )


def _du_mb(path: str) -> float:
    import os

    total = 0
    for root, _dirs, fnames in os.walk(path):
        for fn in fnames:
            try:
                total += os.path.getsize(os.path.join(root, fn))
            except OSError:
                pass
    return total / 1e6


def _ingest_gate_probe(spark, sf_dir: str) -> None:
    """Streaming near-dedup ingest gate + stored-index lifecycle probe
    (VERDICT r12 item 3): the production nightly-crawl shape, measured.
    80% of the documents table becomes the stored corpus index; the
    remaining 20% streams through :func:`near_dedup_ingest_stream` in
    4 epochs (maxFilesPerTrigger=1). Records index build wall + size,
    per-epoch gate wall (triggerExecution), per-epoch delta size,
    compaction wall, and post-compaction index size. Runs in the
    production mode: hash_grams=True (now recorded/validated by the
    index layer, ADVICE r12) with max_bucket=50 on both per-epoch
    passes."""
    import glob as _glob
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.dedup import (
        write_near_dedup_index,
    )
    from mission_data_pipeline_spark.streaming.ingest import (
        compact_near_dedup_index,
        near_dedup_ingest_stream,
    )

    work = tempfile.mkdtemp(prefix="mdps_ingest_probe_")
    idx = os.path.join(work, "idx")
    src = os.path.join(work, "src")
    out = os.path.join(work, "out")
    ckpt = os.path.join(work, "ckpt")
    os.makedirs(src)
    try:
        docs = spark.table("documents").select("doc_id", "text")
        corpus = docs.filter(F.col("doc_id") % 5 != 0)
        t0 = time.monotonic()
        write_near_dedup_index(
            corpus, idx, n=3, num_hashes=16, bands=4, hash_grams=True
        )
        t_build = time.monotonic() - t0
        base_mb = _du_mb(idx)
        n_corpus = corpus.count()
        # stage 4 epoch files (one parquet file each, mtime-ordered so
        # maxFilesPerTrigger=1 yields one epoch per file)
        n_epochs = 4
        n_stream = 0
        for e in range(n_epochs):
            part = docs.filter(
                (F.col("doc_id") % 5 == 0)
                & ((F.col("doc_id") / 5).cast("long") % n_epochs == e)
            )
            n_stream += part.count()
            tmp = os.path.join(work, f"stage{e}")
            part.coalesce(1).write.mode("overwrite").parquet(tmp)
            pf = _glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
            dst = os.path.join(src, f"epoch{e}.parquet")
            shutil.move(pf, dst)
            os.utime(dst, (1_700_000_000 + e, 1_700_000_000 + e))
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        t0 = time.monotonic()
        q = near_dedup_ingest_stream(
            stream, idx, out,
            checkpoint=ckpt, n=3, num_hashes=16, bands=4,
            threshold=0.8, max_bucket=50, hash_grams=True,
        )
        q.awaitTermination()
        t_stream = time.monotonic() - t0
        walls = [
            p["durationMs"]["triggerExecution"] / 1000.0
            for p in q.recentProgress
            if p["numInputRows"] > 0
        ]
        deltas = sorted(
            _glob.glob(os.path.join(idx, "delta", "epoch=*"))
        )
        delta_mb = [round(_du_mb(d), 2) for d in deltas]
        survivors = spark.read.parquet(out).count()
        t0 = time.monotonic()
        comp = compact_near_dedup_index(spark, idx, checkpoint=ckpt, gc=True)
        t_compact = time.monotonic() - t0
        compact_mb = _du_mb(idx)
        print(
            f"ingest_gate_probe: corpus={n_corpus} streamed={n_stream} "
            f"epochs={len(walls)} survivors={survivors} "
            f"index_build_wall={t_build:.1f}s index_mb={base_mb:.1f} "
            f"epoch_walls_s={[round(w, 1) for w in walls]} "
            f"stream_wall={t_stream:.1f}s delta_mb={delta_mb} "
            f"compact_wall={t_compact:.1f}s "
            f"folded={comp['epochs_folded']} "
            f"compacted_index_mb={compact_mb:.1f}",
            flush=True,
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _ann_quality_probe(spark, sf_dir: str) -> None:
    """ANN quality-vs-cost at scale (VERDICT r12 item 6): recall@10 AND
    wall for lsh / ivf / pq-rerank against brute-force ground truth on
    a 100-query sample over the full embeddings table, at the
    production knob defaults — so the defaults are evidence-backed at
    a non-toy scale (and adjusted if recall < 0.8)."""
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.similarity import (
        ann_recall,
        cosine_topk,
        ivf_topk,
        kmeans_centroids,
        lsh_topk,
        pq_encode,
        pq_topk_rerank,
        pq_train_codebooks,
    )

    emb = spark.table("embeddings").select("vec_id", "embedding")
    n_vec = emb.count()
    stride = max(n_vec // 100, 1)
    queries = emb.filter(F.col("vec_id") % stride == 0).limit(100)
    queries = queries.persist()
    nq = queries.count()
    k = 10

    t0 = time.monotonic()
    exact = cosine_topk(emb, queries, k=k).persist()
    exact.count()
    t_exact = time.monotonic() - t0
    print(
        f"ann_quality[exact]: vecs={n_vec} queries={nq} "
        f"wall={t_exact:.1f}s recall=1.000 (ground truth)",
        flush=True,
    )

    def report(name: str, approx, wall: float) -> None:
        r = (
            ann_recall(approx, exact, k=k)
            .agg(F.avg("recall").alias("r"))
            .collect()[0]["r"]
        )
        print(
            f"ann_quality[{name}]: wall={wall:.1f}s recall={r:.3f}",
            flush=True,
        )

    t0 = time.monotonic()
    lsh = lsh_topk(emb, queries, k=k, bits=8, tables=8, dim=64)
    lsh = lsh.persist()
    lsh.count()
    report("lsh b8 t8", lsh, time.monotonic() - t0)

    t0 = time.monotonic()
    cents = kmeans_centroids(emb, n_centroids=64, max_iter=8)
    ivf = ivf_topk(
        emb, queries, k=k, n_probe=8, centroids=cents, n_centroids=64
    ).persist()
    ivf.count()
    report("ivf k64 p8", ivf, time.monotonic() - t0)

    t0 = time.monotonic()
    books = pq_train_codebooks(emb, m=8, k=16)
    enc = pq_encode(emb, books).persist()
    enc.count()
    pq = pq_topk_rerank(
        enc, emb, queries, books, k=k, shortlist=50
    ).persist()
    pq.count()
    report("pq m8 sl50", pq, time.monotonic() - t0)
    for df in (queries, exact, lsh, ivf, enc, pq):
        df.unpersist()


def _capstone_probe(spark, sf_dir: str) -> None:
    """Full curation capstone at the probe scale (VERDICT r12 item 5):
    wall, survivor rows, and job-scoped shuffle bytes for
    curation_shard_build_e2e — the bench's single largest entry,
    composed of gate -> dedup -> scrub -> stats as one plan."""
    from mission_data_pipeline_spark.plans.queries import QUERIES

    sc = spark.sparkContext
    group = "probe:capstone"
    sc.setJobGroup(group, group)
    t0 = time.monotonic()
    df = QUERIES["curation_shard_build_e2e"].spark(spark, sf_dir)
    rows = df.count()
    wall = time.monotonic() - t0
    sb = _shuffle_bytes(spark, group)
    sc.setJobGroup("", "")
    print(
        f"capstone_probe: rows={rows} wall={wall:.1f}s shuffle[{sb}]",
        flush=True,
    )


_CUSTOM = {
    "near_dedup_cap_probe": _near_dedup_cap_probe,
    "hash_grams_ab_probe": _hash_grams_ab_probe,
    "ingest_gate_probe": _ingest_gate_probe,
    "ann_quality_probe": _ann_quality_probe,
    "capstone_probe": _capstone_probe,
}


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
        if name in _CUSTOM:
            _CUSTOM[name](spark, args.sf)
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
