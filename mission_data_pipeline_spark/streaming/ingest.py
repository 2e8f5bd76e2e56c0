"""Streaming near-dedup ingest gate — the nightly crawl loop as a
Structured Streaming job (VERDICT r08 item 7; composes the stored LSH
band index of ``operators/dedup.py write_near_dedup_index`` with
``foreachBatch``).

Every micro-batch of incoming documents is gated against the corpus's
MATERIALIZED band index: only the batch featurizes
(``incremental_near_dedup(corpus_bands=..., corpus_grams=...)``),
survivors land in the output table, and — with ``update_index=True`` —
the survivors' own band signatures and gram sets are appended as index
DELTAS so a near-duplicate of a doc accepted three batches ago is
caught too, without ever re-featurizing the corpus.

Exactly-once across crashes WITHOUT a transactional table format:
``foreachBatch`` may replay an epoch whose sink writes half-landed
before a crash, so every write is an idempotent per-epoch OVERWRITE —
``{out}/epoch=N/`` for survivors, ``{index}/delta/epoch=N/{bands,grams}``
for the index deltas. A replayed epoch rewrites exactly its own
directories; completed epochs are never replayed (the checkpoint's
commit log gates that), so reading "all delta epochs except the one
being processed" is both correct (the current epoch's delta derives
from the very batch being gated — including it would let a batch
near-dup itself) and crash-safe (a half-written current-epoch delta
from the aborted attempt is ignored, then overwritten).

At 100 TB the per-epoch listing/union of deltas is the simplification
to replace with a transactional table (Delta/Iceberg MERGE into the
band index, which also compacts deltas); the gating joins themselves
are already the scale shape — shuffle ∝ batch + collisions, never
batch × corpus.

The reference pipeline (northflowlabs/mission-data-pipeline) has no
streaming ingest or dedup; this extends the W1/X2 surface.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from mission_data_pipeline_spark.operators.dedup import (
    band_signatures,
    incremental_near_dedup,
    minhash_signatures,
    read_near_dedup_index,
    shingles,
)

__all__ = ["compact_near_dedup_index", "near_dedup_ingest_stream"]


def _delta_paths(index_path: str, *, current_epoch: int) -> tuple[list, list]:
    """(bands_paths, grams_paths) of all COMMITTED delta epochs — every
    epoch directory except the one being processed (see module doc)."""
    root = os.path.join(index_path, "delta")
    bands_paths, grams_paths = [], []
    if os.path.isdir(root):
        for name in sorted(os.listdir(root)):
            if not name.startswith("epoch="):
                continue
            if int(name.split("=", 1)[1]) == current_epoch:
                continue
            b = os.path.join(root, name, "bands")
            g = os.path.join(root, name, "grams")
            if os.path.isdir(b) and os.path.isdir(g):
                bands_paths.append(b)
                grams_paths.append(g)
    return bands_paths, grams_paths


def compact_near_dedup_index(spark, index_path: str) -> dict:
    """Fold committed streaming delta epochs into the base index — the
    nightly OPTIMIZE for the ingest gate. Rewrites ``{index}/bands``
    (partitioned by band) and ``{index}/grams`` to include every delta
    epoch's rows, then removes the delta directory, so the next day's
    gating reads one compacted table instead of a base + N-epoch union.
    Returns ``{"epochs_folded": n}``.

    MUST NOT run concurrently with an active ingest stream: the stream
    reads "all delta epochs except the one being processed", and a
    concurrent fold would present those rows twice (base + delta). At
    scale this whole function is a transactional-table MERGE +
    compaction (Delta/Iceberg); here the swap is two directory renames
    — crash-safe on a local/HDFS-like filesystem in the sense that
    either the old or the new layout is fully present (``params.json``
    is never touched).
    """
    import shutil

    delta_root = os.path.join(index_path, "delta")
    dbp, dgp = _delta_paths(index_path, current_epoch=-1)
    if not dbp:
        shutil.rmtree(delta_root, ignore_errors=True)
        return {"epochs_folded": 0}
    base_bands, base_grams = read_near_dedup_index(spark, index_path)
    all_bands = base_bands.unionByName(
        spark.read.parquet(*dbp).select("doc_id", "band", "band_hash")
    )
    all_grams = base_grams.unionByName(
        spark.read.parquet(*dgp).select("doc_id", "gram")
    )
    bands_new = os.path.join(index_path, "bands__compacting")
    grams_new = os.path.join(index_path, "grams__compacting")
    all_bands.write.mode("overwrite").partitionBy("band").parquet(bands_new)
    all_grams.write.mode("overwrite").parquet(grams_new)
    for cur, new in (
        (os.path.join(index_path, "bands"), bands_new),
        (os.path.join(index_path, "grams"), grams_new),
    ):
        old = cur + "__old"
        os.rename(cur, old)
        os.rename(new, cur)
        shutil.rmtree(old, ignore_errors=True)
    shutil.rmtree(delta_root, ignore_errors=True)
    return {"epochs_folded": len(dbp)}


def near_dedup_ingest_stream(
    stream: DataFrame,
    index_path: str,
    out_path: str,
    *,
    checkpoint: str,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    update_index: bool = True,
    available_now: bool = True,
) -> StreamingQuery:
    """Start the ingest gate on a streaming DataFrame of documents.

    ``index_path`` must hold a :func:`write_near_dedup_index` layout;
    the probe parameters are validated against its ``params.json``
    (mismatched shingle width would silently wave every near-dup
    through). Survivor rows (original schema) land under
    ``{out_path}/epoch=N/``; read the result with
    ``spark.read.parquet(out_path)`` (``epoch`` becomes a partition
    column). Returns the started :class:`StreamingQuery`.
    """
    spark = stream.sparkSession
    # fail at start(), not mid-stream, on a mismatched index
    read_near_dedup_index(
        spark, index_path, n=n, num_hashes=num_hashes, bands=bands
    )

    def gate(batch: DataFrame, epoch_id: int) -> None:
        base_bands, base_grams = read_near_dedup_index(spark, index_path)
        dbp, dgp = _delta_paths(index_path, current_epoch=epoch_id)
        corpus_bands = (
            base_bands.unionByName(
                spark.read.parquet(*dbp).select(
                    "doc_id", "band", "band_hash"
                )
            )
            if dbp
            else base_bands
        )
        corpus_grams = (
            base_grams.unionByName(
                spark.read.parquet(*dgp).select("doc_id", "gram")
            )
            if dgp
            else base_grams
        )
        survivors = incremental_near_dedup(
            batch,
            n=n,
            num_hashes=num_hashes,
            bands=bands,
            threshold=threshold,
            text_col=text_col,
            id_col=id_col,
            corpus_bands=corpus_bands,
            corpus_grams=corpus_grams,
        )
        epoch_dir = os.path.join(out_path, f"epoch={epoch_id}")
        survivors.write.mode("overwrite").parquet(epoch_dir)
        if not update_index:
            return
        # derive the delta from the WRITTEN files, so the index update
        # is consistent with what the sink actually committed
        landed = spark.read.parquet(epoch_dir)
        g = shingles(landed, n=n, text_col=text_col, id_col=id_col)
        sig = minhash_signatures(g, num_hashes=num_hashes)
        ddir = os.path.join(index_path, "delta", f"epoch={epoch_id}")
        band_signatures(sig, bands=bands).write.mode("overwrite").parquet(
            os.path.join(ddir, "bands")
        )
        g.write.mode("overwrite").parquet(os.path.join(ddir, "grams"))

    writer = stream.writeStream.foreachBatch(gate).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
