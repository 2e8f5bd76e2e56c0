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


def _ivf_disk_probe(spark, sf_dir: str) -> None:
    """On-disk IVF index + ANN serving path at probe scale (VERDICT r13
    item 2): the stored-index lifecycle measurement the dedup index got
    in r13, for the ANN side. Records k-means wall, index build wall +
    size, probe wall (50-query batch), the fraction of centroid
    partitions PRUNED by the static probe predicate, and tie-aware
    recall@10 vs exact ground truth on the same query sample."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.operators.similarity import (
        ann_recall,
        cosine_topk,
        ivf_probe_index,
        ivf_write_index,
        kmeans_centroids,
    )

    emb = spark.table("embeddings").select("vec_id", "embedding")
    n_vec = emb.count()
    n_centroids = 64
    work = tempfile.mkdtemp(prefix="mdps_ivf_disk_probe_")
    idx = os.path.join(work, "ivf")
    try:
        t0 = time.monotonic()
        cents = kmeans_centroids(
            emb, n_centroids=n_centroids, max_iter=8
        )
        t_kmeans = time.monotonic() - t0
        t0 = time.monotonic()
        ivf_write_index(emb, idx, cents)
        t_build = time.monotonic() - t0
        idx_mb = _du_mb(idx)
        n_parts = sum(
            1 for d in os.listdir(idx) if d.startswith("centroid_id=")
        )
        stride = max(n_vec // 50, 1)
        queries = (
            emb.filter(F.col("vec_id") % stride == 0).limit(50).persist()
        )
        nq = queries.count()
        n_probe = 8
        t0 = time.monotonic()
        probed = ivf_probe_index(
            spark, idx, queries, cents, k=10, n_probe=n_probe
        ).persist()
        probed.count()
        t_probe = time.monotonic() - t0
        # partitions the batch predicate admits — everything else is
        # directory-pruned before a byte is read (same probe-selection
        # expression ivf_probe_index builds its static IN filter from)
        from mission_data_pipeline_spark.functions.vectors import l2_norm
        from mission_data_pipeline_spark.operators.similarity import (
            _centroid_literals,
            _centroid_sim_array,
        )

        probe_arr = _centroid_sim_array("__qv", _centroid_literals(cents))
        touched = (
            queries.select(F.col("embedding").alias("__qv"))
            .withColumn("__vnorm", l2_norm(F.col("__qv")))
            .withColumn(
                "centroid_id",
                F.explode(
                    F.expr(
                        f"transform(slice(array_sort({probe_arr}),"
                        f" -{n_probe}, {n_probe}), s -> -s.negcid)"
                    )
                ),
            )
            .select("centroid_id")
            .distinct()
            .count()
        )
        t0 = time.monotonic()
        exact = cosine_topk(
            emb, queries, k=10, round_digits=6, include_ties=True
        )
        rec = (
            ann_recall(probed, exact, k=10, tie_aware=True)
            .agg(F.avg("recall").alias("r"))
            .first()["r"]
        )
        t_exact = time.monotonic() - t0
        print(
            f"ivf_disk_probe: vecs={n_vec} centroids={n_parts} "
            f"kmeans_wall={t_kmeans:.1f}s build_wall={t_build:.1f}s "
            f"index_mb={idx_mb:.1f} queries={nq} n_probe={n_probe} "
            f"probe_wall={t_probe:.1f}s "
            f"partitions_touched={touched}/{n_parts} "
            f"pruned_frac={1 - touched / max(n_parts, 1):.3f} "
            f"tie_recall@10={rec:.3f} "
            f"(exact_ground_truth_wall={t_exact:.1f}s)",
            flush=True,
        )
        queries.unpersist()
        probed.unpersist()
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _streaming_state_probe(spark, sf_dir: str) -> None:
    """Streaming at anchor scale (VERDICT r13 item 4): the real-run
    stream-stream interval join and the applyInPandasWithState EWMA,
    driven over the probe-scale events table instead of the sf0.01
    fixture. Records per-micro-batch walls, state-store rows/bytes,
    watermark lag at the end of each batch, and the restart-replay
    wall (second run from the same checkpoint with no new files must
    be a metadata-only no-op)."""
    import glob as _glob
    import os
    import shutil
    import tempfile

    from pyspark.sql import Window, functions as F

    from mission_data_pipeline_spark.streaming.stateful import ewma_stream

    ev = spark.sql(
        "SELECT event_id, user_id, event_type, ts_ns DIV 1000 AS ts_us, "
        "value FROM events"
    )
    n_events = ev.count()
    work = tempfile.mkdtemp(prefix="mdps_stream_probe_")

    def stage_slices(df, cols_schema: str, n_slices: int, sub: str) -> str:
        """Write df as n time-contiguous files with ascending mtimes."""
        stream_dir = os.path.join(work, sub)
        os.makedirs(stream_dir)
        sliced = df.withColumn(
            "__slice",
            F.ntile(n_slices).over(Window.orderBy("ts_us", "event_id")),
        )
        for i in range(1, n_slices + 1):
            d = os.path.join(work, f"{sub}_stage{i}")
            sliced.filter(F.col("__slice") == i).drop(
                "__slice"
            ).coalesce(1).write.mode("overwrite").parquet(d)
            src = _glob.glob(os.path.join(d, "part-*.parquet"))[0]
            dst = os.path.join(stream_dir, f"{i:02d}.parquet")
            shutil.move(src, dst)
            os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
        return stream_dir

    def batch_report(tag: str, q, wall: float) -> None:
        rows = []
        for p in q.recentProgress:
            if p["numInputRows"] == 0:
                continue
            so = p.get("stateOperators") or []
            wm = (p.get("eventTime") or {}).get("watermark", "-")
            rows.append(
                (
                    p["numInputRows"],
                    p["durationMs"]["triggerExecution"] / 1000.0,
                    sum(s.get("numRowsTotal", 0) for s in so),
                    sum(s.get("memoryUsedBytes", 0) for s in so) / 1e6,
                    wm,
                )
            )
        per_batch = " ".join(
            f"[rows={r} wall={w:.1f}s state_rows={sr} state_mb={sm:.1f}"
            f" wm={wm}]"
            for r, w, sr, sm, wm in rows
        )
        print(
            f"streaming_state_probe[{tag}]: events={n_events} "
            f"batches={len(rows)} total_wall={wall:.1f}s {per_batch}",
            flush=True,
        )

    try:
        # --- stream-stream interval join (clicks x purchases, 30 min) ---
        join_dir = stage_slices(ev, "", 4, "join_src")
        ckpt = os.path.join(work, "join_ckpt")
        out = os.path.join(work, "join_out")
        schema = (
            "event_id long, user_id long, event_type string, "
            "ts_us long, value double"
        )

        def run_join() -> object:
            def side(event_type: str, prefix: str):
                return (
                    spark.readStream.schema(schema)
                    .option("maxFilesPerTrigger", 1)
                    .parquet(join_dir)
                    .filter(F.col("event_type") == event_type)
                    .select(
                        F.col("event_id").alias(f"{prefix}_event_id"),
                        F.col("user_id").alias(f"{prefix}_user_id"),
                        F.timestamp_micros("ts_us").alias(f"{prefix}_time"),
                    )
                    .withWatermark(f"{prefix}_time", "1 hour")
                )

            joined = side("click", "click").join(
                side("purchase", "purchase"),
                F.expr(
                    "click_user_id = purchase_user_id AND "
                    "purchase_time >= click_time AND "
                    "purchase_time <= click_time + INTERVAL 30 MINUTES"
                ),
            )
            return (
                joined.writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )

        t0 = time.monotonic()
        q = run_join()
        q.awaitTermination()
        t_join = time.monotonic() - t0
        batch_report("stream_join", q, t_join)
        matches = spark.read.parquet(out).count()
        # restart from the same checkpoint, no new files: the seen-files
        # log must skip everything — replay wall is pure recovery cost
        t0 = time.monotonic()
        q2 = run_join()
        q2.awaitTermination()
        t_replay = time.monotonic() - t0
        replay_rows = sum(p["numInputRows"] for p in q2.recentProgress)
        print(
            f"streaming_state_probe[join_restart]: matches={matches} "
            f"replay_wall={t_replay:.1f}s replayed_rows={replay_rows}",
            flush=True,
        )

        # --- stateful EWMA (applyInPandasWithState) ---
        ewma_src = stage_slices(
            ev.select(
                F.col("user_id").alias("key"),
                "event_id",
                F.col("ts_us").alias("t_us"),
                "value",
            ).withColumn("ts_us", F.col("t_us")),
            "",
            4,
            "ewma_src",
        )
        stream = (
            spark.readStream.schema(
                "key long, event_id long, t_us long, value double, ts_us long"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(ewma_src)
            .drop("ts_us")
        )
        ewma_out = os.path.join(work, "ewma_out")
        t0 = time.monotonic()
        q3 = (
            ewma_stream(stream, alpha=0.25)
            .writeStream.format("parquet")
            .option("path", ewma_out)
            .option(
                "checkpointLocation", os.path.join(work, "ewma_ckpt")
            )
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q3.awaitTermination()
        t_ewma = time.monotonic() - t0
        batch_report("ewma", q3, t_ewma)
        emitted = spark.read.parquet(ewma_out).count()
        print(
            f"streaming_state_probe[ewma_emitted]: rows={emitted} "
            f"(must equal events={n_events})",
            flush=True,
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _media_decode_probe(spark, sf_dir: str) -> None:
    """Multimodal decode throughput + Arrow batch memory at probe
    payload volume (VERDICT r13 item 5). Builds a real PNG corpus
    sized off the documents table (distributed encode — width scales
    with doc_id so the size distribution is skewed like real crawls),
    then measures:

    - peak single-batch payload bytes UNGUARDED (default 10k-record
      Arrow batches — the worker-OOM vector at real image sizes) vs
      under :class:`media_arrow_batch_guard` (64 MiB target);
    - real JPEG-pipeline-shaped decode throughput (image_pixel_stats
      rows/s) under the guard;
    - WAV sample-stats throughput at the same scale."""
    import os
    import shutil
    import tempfile

    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.functions.multimodal import (
        audio_sample_stats,
        image_pixel_stats,
        media_arrow_batch_guard,
        peak_batch_bytes,
    )

    n_items = min(
        int(spark.table("documents").count()), 6_000
    )
    work = tempfile.mkdtemp(prefix="mdps_media_probe_")
    img_path = os.path.join(work, "imgs")
    wav_path = os.path.join(work, "wavs")
    try:
        ids = spark.range(n_items).select(
            F.col("id").alias("item_id")
        )

        def gen_png(batches):
            from mission_data_pipeline_spark.functions.multimodal import (
                encode_png,
            )

            for pdf in batches:
                payloads = []
                for i in pdf["item_id"]:
                    # 64..576 px square of seeded PRNG noise —
                    # incompressible, so the PNG carries ~raw bytes
                    # (12 kB .. ~1 MB) and the size distribution is
                    # skewed the way real crawls are; a gradient
                    # fixture deflates to ~4 kB and proves nothing
                    # about batch memory
                    w = 64 + (int(i) % 9) * 64
                    rng = np.random.default_rng(int(i))
                    px = rng.integers(
                        0, 256, size=(w, w, 3), dtype=np.uint8
                    )
                    payloads.append(encode_png(px))
                yield pd.DataFrame(
                    {"item_id": pdf["item_id"], "payload": payloads}
                )

        def gen_wav(batches):
            from mission_data_pipeline_spark.functions.multimodal import (
                encode_wav,
            )

            for pdf in batches:
                payloads = []
                for i in pdf["item_id"]:
                    n = 8000 + (int(i) % 17) * 2000  # 0.5-2.6 s @ 16 kHz
                    t = np.arange(n)
                    s = (
                        3000 * np.sin(0.03 * t * (1 + (int(i) % 5)))
                    ).astype("int16")
                    payloads.append(encode_wav(s))
                yield pd.DataFrame(
                    {"item_id": pdf["item_id"], "payload": payloads}
                )

        t0 = time.monotonic()
        ids.repartition(32).mapInPandas(
            gen_png, schema="item_id long, payload binary"
        ).write.mode("overwrite").parquet(img_path)
        t_gen = time.monotonic() - t0
        imgs = spark.read.parquet(img_path)
        total_mb = _du_mb(img_path)

        unguarded = peak_batch_bytes(imgs).agg(
            F.max("batch_bytes").alias("b"), F.max("batch_rows").alias("r")
        ).first()
        with media_arrow_batch_guard(spark, imgs) as g:
            guarded = peak_batch_bytes(imgs).agg(
                F.max("batch_bytes").alias("b"),
                F.max("batch_rows").alias("r"),
            ).first()
            t0 = time.monotonic()
            n_dec = image_pixel_stats(imgs).filter(
                F.col("px_mean").isNotNull()
            ).count()
            t_dec = time.monotonic() - t0
        print(
            f"media_decode_probe[image]: items={n_items} "
            f"corpus_mb={total_mb:.1f} gen_wall={t_gen:.1f}s "
            f"max_payload_kb={g.max_payload_bytes / 1e3:.0f} "
            f"peak_batch_mb_unguarded={unguarded['b'] / 1e6:.1f} "
            f"(rows={unguarded['r']}) "
            f"peak_batch_mb_guarded={guarded['b'] / 1e6:.1f} "
            f"(cap={g.records_per_batch}) "
            f"decode_wall={t_dec:.1f}s decoded={n_dec} "
            f"rows_per_sec={n_dec / max(t_dec, 1e-9):.0f} "
            f"mb_per_sec={total_mb / max(t_dec, 1e-9):.0f}",
            flush=True,
        )

        ids.repartition(32).mapInPandas(
            gen_wav, schema="item_id long, payload binary"
        ).write.mode("overwrite").parquet(wav_path)
        wavs = spark.read.parquet(wav_path)
        wav_mb = _du_mb(wav_path)
        with media_arrow_batch_guard(spark, wavs) as g2:
            t0 = time.monotonic()
            n_dec = audio_sample_stats(wavs).filter(
                F.col("n_frames").isNotNull()
            ).count()
            t_dec = time.monotonic() - t0
        print(
            f"media_decode_probe[audio]: items={n_items} "
            f"corpus_mb={wav_mb:.1f} cap={g2.records_per_batch} "
            f"decode_wall={t_dec:.1f}s decoded={n_dec} "
            f"rows_per_sec={n_dec / max(t_dec, 1e-9):.0f} "
            f"mb_per_sec={wav_mb / max(t_dec, 1e-9):.0f}",
            flush=True,
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _hdf5_ceiling_probe(spark, sf_dir: str) -> None:
    """L5 practical-ceiling measurement (VERDICT r13 item 7): the HDF5
    sink is a DRIVER-SIDE export by design (SURVEY §4.2 — one POSIX
    file, no parallel writer without MPI h5py). Measure wall + driver
    RSS growth for exporting a tidy params frame derived from the
    probe-scale events table, so the sink docstring's "use parquet
    beyond N rows" line is a number, not a guess."""
    import os
    import resource
    import tempfile

    from pyspark.sql import functions as F

    from mission_data_pipeline_spark.sinks.hdf5 import write_hdf5

    params = spark.sql(
        "SELECT concat('param_', CAST(user_id % 50 AS STRING)) AS name, "
        "'V' AS unit, CAST(NULL AS STRING) AS eng_value_str, "
        "ts_ns DIV 1000 AS t_us, value AS eng_value, "
        "CAST(event_id AS INT) AS raw_value, TRUE AS validity "
        "FROM events"
    )
    n = params.count()
    out = os.path.join(
        tempfile.mkdtemp(prefix="mdps_hdf5_probe_"), "export.h5"
    )
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    t0 = time.monotonic()
    write_hdf5(params, out, mode="w")
    wall = time.monotonic() - t0
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    mb = os.path.getsize(out) / 1e6
    print(
        f"hdf5_ceiling_probe: rows={n} wall={wall:.1f}s "
        f"rows_per_sec={n / max(wall, 1e-9):.0f} file_mb={mb:.1f} "
        f"driver_rss_mb_before={rss0:.0f} after={rss1:.0f}",
        flush=True,
    )
    os.remove(out)


_CUSTOM = {
    "near_dedup_cap_probe": _near_dedup_cap_probe,
    "hash_grams_ab_probe": _hash_grams_ab_probe,
    "ingest_gate_probe": _ingest_gate_probe,
    "ann_quality_probe": _ann_quality_probe,
    "capstone_probe": _capstone_probe,
    "ivf_disk_probe": _ivf_disk_probe,
    "streaming_state_probe": _streaming_state_probe,
    "media_decode_probe": _media_decode_probe,
    "hdf5_ceiling_probe": _hdf5_ceiling_probe,
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
