"""Watermarked event-time operators over streaming (or batch) params_df.

The reference has no watermarks or state store (SURVEY §2.6) — its only
late/duplicate-data semantic is wide-pivot last-wins. These are the
Structured Streaming restatements over the tidy schema; every helper
also works on a batch DataFrame (watermark is a no-op there), which is
how the DuckDB oracles check them.

``time_tai`` is a double (TAI seconds, not a civil timestamp); event
time for watermarking is derived with ``timestamp_seconds`` — an offset
conversion, not a timezone interpretation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_event_time(params: DataFrame, col: str = "time_tai") -> DataFrame:
    return params.withColumn("event_time", F.timestamp_seconds(F.col(col)))


def dedup_late_samples(
    params: DataFrame, *, watermark: str = "30 seconds"
) -> DataFrame:
    """W4: drop duplicate (name, time) samples with bounded state.

    Streaming: ``dropDuplicates`` keeps the FIRST arrival per key and
    the watermark bounds how long a key is remembered. Batch callers
    wanting deterministic last-wins should use
    ``operators.dataset.dedup_samples`` instead.
    """
    df = with_event_time(params)
    if df.isStreaming:
        df = df.withWatermark("event_time", watermark)
    return df.dropDuplicates(["name", "event_time"]).drop("event_time")


def windowed_stats(
    params: DataFrame,
    *,
    window: str = "10 seconds",
    slide: str | None = None,
    watermark: str = "30 seconds",
) -> DataFrame:
    """W1-style tumbling/sliding per-parameter stats with late-data bound.

    Output: (name, window_start, window_end, n, avg_eng, min_eng, max_eng).
    In streaming mode the watermark lets Spark finalize and evict
    windows; in batch mode the same plan is a plain group-by.
    """
    df = with_event_time(params)
    if df.isStreaming:
        df = df.withWatermark("event_time", watermark)
    win = (
        F.window("event_time", window, slide)
        if slide
        else F.window("event_time", window)
    )
    return (
        df.groupBy(F.col("name"), win.alias("w"))
        .agg(
            F.count("*").alias("n"),
            F.avg("eng_value").alias("avg_eng"),
            F.min("eng_value").alias("min_eng"),
            F.max("eng_value").alias("max_eng"),
        )
        .select(
            "name",
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n",
            "avg_eng",
            "min_eng",
            "max_eng",
        )
    )


def dedup_stream_content(
    stream: DataFrame,
    *,
    text_col: str = "text",
    time_col: str = "event_time",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup by content hash with BOUNDED state (X1 x W4).

    Keys on ``xxhash64(text)`` and uses
    ``dropDuplicatesWithinWatermark``: two copies of a document arriving
    within ``watermark`` of each other dedup, and a key's state is
    evicted once the watermark passes it — unlike plain
    ``dropDuplicates``, whose state grows with every distinct document
    ever seen (unbounded on a 100 TB firehose). Batch callers get plain
    first-wins hash dedup from the same call (watermark is meaningless
    there), which is how the parity test checks it.
    """
    df = stream.withColumn("__h", F.xxhash64(F.col(text_col)))
    if df.isStreaming:
        out = df.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(
            ["__h"]
        )
    else:
        out = df.dropDuplicates(["__h"])
    return out.drop("__h")
