"""Example 11 — WARC crawl → streaming curation gate, end to end.

No reference counterpart (the reference is telemetry-only). The full
production crawl-ingest story the round-9/10 pieces support, composed
the way a pre-training data team runs it:

  1. Materialize the corpus's near-dedup index
     (``write_near_dedup_index`` — manifest-pointed, transactional).
  2. Archives arrive as WARC files; ``read_warc_stream`` fans each
     archive out to typed records (Arrow-batched, one archive per
     task — Common Crawl granularity).
  3. In-stream curation: ``warc_to_documents`` bridges records to the
     documents shape, ``extract_html_text`` strips the pages' markup
     and boilerplate (nav/footer link rows, scripts — the crawled
     payloads are real HTML, so every downstream gate must see TEXT,
     not tags), the Gopher word-level rules gate quality as ONE
     streaming-safe projection (``keep_text=True``), and
     ``near_dedup_ingest_stream`` gates the survivors against the
     stored index — near-dups of the corpus AND of docs accepted in
     earlier epochs are dropped, per-epoch idempotent writes keep it
     exactly-once across restarts.
  4. Nightly OPTIMIZE: ``compact_near_dedup_index`` folds the
     committed epoch deltas into a new base version (atomic manifest
     publish; only epochs the stream checkpoint committed), and a
     post-compaction probe still catches everything.

Run from the repo root::

    python examples/11_warc_crawl_ingest.py
"""

from __future__ import annotations

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
from mission_data_pipeline_spark.operators.html import extract_html_text
from mission_data_pipeline_spark.operators.text import gopher_quality_signals
from mission_data_pipeline_spark.sources.warc import (
    build_warc_record,
    read_warc_stream,
    warc_to_documents,
)
from mission_data_pipeline_spark.streaming.ingest import (
    compact_near_dedup_index,
    near_dedup_ingest_stream,
)

SF_DIR = "/root/testdata/sf0.001"

FRESH_B = (
    "the archive crawler discovered a genuinely new page about tidal "
    "energy turbines and their maintenance schedules along the coast"
)
FRESH_E = (
    "another novel page describing alpine seed vaults and the careful "
    "cataloguing of heritage grain varieties for future growers"
)
JUNK_C = "### 123 ### 456 ### 789 ### 000 ### 111 ### 222 ### 333 ###"


def page(body_text: str, title: str) -> bytes:
    """Render a payload as a real HTML page: nav + footer link rows and
    an inline script that extract_html_text must strip, the body text
    in a single <p> so extraction recovers it byte-identically."""
    return (
        f"<html><head><title>{title}</title><style>a{{color:blue}}</style>"
        '</head><body><nav><a href="/">Home</a> <a href="/crawl">Crawl</a>'
        f'</nav><p>{body_text}</p><script>track("{title}");</script>'
        '<footer><a href="/terms">Terms of use link row</a></footer>'
        "</body></html>"
    ).encode()


def main() -> None:
    spark = get_spark(master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="mdps_example11_")
    try:
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        corpus = docs.filter(F.col("doc_id") < 80).select("doc_id", "text")
        corpus_text = corpus.filter(F.col("doc_id") == 0).first()["text"]

        # 1. The corpus index (nightly, corpus-side cost only).
        idx = f"{work}/index"
        write_near_dedup_index(corpus, idx, n=2, num_hashes=8, bands=4)

        # 2. Two waves of WARC archives. Wave 1: a near-copy of corpus
        # doc 0 (dedup drop), a fresh good page (survive), and symbol
        # junk (Gopher drop). Wave 2: a near-copy of the page ACCEPTED
        # in wave 1 (caught only by the epoch delta) and a fresh page.
        warc_dir = Path(work) / "warc"
        warc_dir.mkdir()
        wave1 = build_warc_record(
            page(corpus_text + " extra", "near-corpus"),
            record_id="<urn:rec:near-corpus>",
            target_uri="http://crawl/near-corpus",
        ) + build_warc_record(
            page(FRESH_B, "fresh-b"),
            record_id="<urn:rec:fresh-b>",
            target_uri="http://crawl/fresh-b",
        ) + build_warc_record(
            page(JUNK_C, "junk-c"),
            record_id="<urn:rec:junk-c>",
            target_uri="http://crawl/junk-c",
        )
        wave2 = build_warc_record(
            page(FRESH_B + " extra", "near-b"),
            record_id="<urn:rec:near-b>",
            target_uri="http://crawl/near-b",
        ) + build_warc_record(
            page(FRESH_E, "fresh-e"),
            record_id="<urn:rec:fresh-e>",
            target_uri="http://crawl/fresh-e",
        )
        (warc_dir / "wave1.warc").write_bytes(wave1)
        (warc_dir / "wave2.warc").write_bytes(wave2)
        # the file source orders by modification time — pin wave1 first
        # (same-second writes would make the arrival order a coin flip)
        import os as _os
        import time as _time

        now = _time.time()
        _os.utime(warc_dir / "wave1.warc", (now - 100, now - 100))
        _os.utime(warc_dir / "wave2.warc", (now - 50, now - 50))

        # 3. The streaming curation pipeline: records → documents →
        # HTML→text extraction (the crawled payloads are pages; the
        # boilerplate link rows and scripts must not reach the quality
        # or dedup gates) → Gopher gate (one projection, keep_text
        # threads the payload through) → stored-index near-dedup gate.
        records = read_warc_stream(
            spark, str(warc_dir), max_files_per_trigger=1
        )
        staged = warc_to_documents(records).withColumnRenamed(
            "source", "url"
        )
        staged = extract_html_text(staged, "text", out_col="text")
        gated = (
            gopher_quality_signals(
                staged.select("doc_id", "text"),
                min_words=5,
                min_stopwords=1,
                keep_text=True,
            )
            .filter(F.col("gopher_pass"))
            .select("doc_id", "text")
        )
        q = near_dedup_ingest_stream(
            gated,
            idx,
            f"{work}/out",
            checkpoint=f"{work}/ckpt",
            n=2,
            num_hashes=8,
            bands=4,
            threshold=0.6,
        )
        q.awaitTermination(120)

        kept = spark.read.parquet(f"{work}/out")
        kept_texts = sorted(r["text"] for r in kept.collect())
        print(f"[stream] {len(kept_texts)} of 5 crawled records survived")
        assert kept_texts == sorted([FRESH_B, FRESH_E]), kept_texts

        # 4. Nightly OPTIMIZE: fold the committed epoch deltas, then
        # prove the compacted index still gates near-dups of corpus
        # AND streamed survivors.
        res = compact_near_dedup_index(
            spark, idx, checkpoint=f"{work}/ckpt"
        )
        print(
            f"[compact] folded {res['epochs_folded']} epochs -> index "
            f"version {res['version']}"
        )
        assert res["epochs_folded"] >= 1 and not res[
            "epochs_skipped_uncommitted"
        ]
        bands_df, grams_df = read_near_dedup_index(spark, idx)
        probe = spark.createDataFrame(
            [
                (900, FRESH_E + " extra"),
                (901, corpus_text + " extra"),
                (902, "entirely unseen sentence about canyon echoes at dawn"),
            ],
            "doc_id long, text string",
        )
        survivors = sorted(
            r["doc_id"]
            for r in incremental_near_dedup(
                probe,
                n=2,
                num_hashes=8,
                bands=4,
                threshold=0.6,
                corpus_bands=bands_df,
                corpus_grams=grams_df,
            ).collect()
        )
        assert survivors == [902], survivors
        print("[probe] post-compaction gate catches corpus + streamed dups")
        print("SUCCESS")
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
