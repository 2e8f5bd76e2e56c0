"""Example 08 — hot-channel smoothing at scale + lossless audio archive
+ image near-duplicate sweep.

The round-7 capabilities composed into one pass, each in its 100 TB
shape:

  1. HOT-CHANNEL EWMA: one telemetry channel too big for a single task
     is smoothed with the parallel-prefix decomposition
     (operators/timeseries.py ewma_sharded) — per-shard zero-state
     scans, a tiny tail-state chain, map-side recombination. Values
     agree with the single-pass recurrence (checked here) while every
     stage stays shard-bounded.
  2. LOSSLESS AUDIO ARCHIVE: samples round-trip through the repo's own
     FLAC codec (functions/flac.py — Rice-coded fixed predictors, pure
     stdlib+NumPy) and through an AVI container's G.711 audio track
     (functions/avi.py decode_avi_audio); both decode back to exact
     integers inside Arrow batches.
  3. IMAGE NEAR-DUP SWEEP: every image gets a 64-bit dHash perceptual
     fingerprint (integer-exact luma/resample/difference bits), and
     near-duplicate pairs come from eight 8-bit band bucket joins —
     exact recall to Hamming 7, the corpus never self-joins on pixels.

Run from the repo root::

    python examples/08_hot_channels_and_image_dedup.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
from pyspark.sql import functions as F

from mission_data_pipeline_spark import get_spark
from mission_data_pipeline_spark.functions.audio_codecs import decode_ulaw
from mission_data_pipeline_spark.functions.avi import encode_avi_mjpeg
from mission_data_pipeline_spark.functions.flac import encode_flac
from mission_data_pipeline_spark.functions.jpeg import encode_jpeg
from mission_data_pipeline_spark.functions.multimodal import (
    avi_audio_sample_stats,
    encode_png,
    flac_sample_stats,
    image_dhash,
)
from mission_data_pipeline_spark.operators.dedup import dhash_near_pairs
from mission_data_pipeline_spark.operators.timeseries import (
    ewma,
    ewma_sharded,
)


def main() -> None:
    spark = get_spark(master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")

    # 1. Hot-channel EWMA: sharded == single-pass, but shard-bounded ---
    n = 40_000
    chan = spark.range(n).select(
        F.lit("battery_bus_v").alias("name"),
        (F.col("id") / 10_000).cast("int").alias("day"),  # 4 shards
        F.col("id").alias("t_us"),
        ((F.col("id") * 7 % 1001) - 500).cast("double").alias("value"),
    )
    sharded = ewma_sharded(
        chan, alpha=0.25, time_col="t_us", value_col="value",
        series_cols=["name"], shard_col="day",
    )
    plain = ewma(
        chan, alpha=0.25, time_col="t_us", value_col="value",
        series_cols=["name"],
    )
    joined = sharded.alias("s").join(
        plain.alias("p"), ["name", "t_us"]
    ).select(
        F.max(F.abs(F.col("s.ewma") - F.col("p.ewma"))).alias("max_delta")
    )
    delta = joined.first()["max_delta"]
    print(f"[ewma] {n} rows, 4 shards: max |sharded - single-pass| = {delta:.3e}")
    assert delta < 1e-9

    # 2. Lossless audio archive: FLAC + AVI G.711 track ----------------
    t = np.arange(2000)
    sig = (800 * np.sin(t / 40)).astype(np.int64)[:, None]
    coded = bytes((j * 13 + 7) % 256 for j in range(600))
    frame = encode_jpeg(np.full((8, 8, 3), 96, dtype=np.uint8))
    audio_lake = spark.createDataFrame(
        [
            (0, bytearray(encode_flac(sig, rate=8000, block_size=256))),
            (1, bytearray(encode_avi_mjpeg(
                [frame] * 2, width=8, height=8, audio=coded,
                audio_format=7, audio_rate=8000))),
        ],
        "item_id long, payload binary",
    )
    flac_row = flac_sample_stats(audio_lake.filter("item_id = 0")).first()
    avi_row = avi_audio_sample_stats(audio_lake.filter("item_id = 1")).first()
    assert flac_row["s_sum"] == int(sig.sum())  # lossless: exact integers
    assert avi_row["s_sum"] == int(decode_ulaw(coded).sum())
    print(
        f"[audio] FLAC {flac_row['n_frames']} frames exact-sum "
        f"{flac_row['s_sum']}; AVI mu-law track {avi_row['n_frames']} "
        f"frames exact-sum {avi_row['s_sum']}"
    )

    # 3. Image near-dup sweep: dHash + banded pairing ------------------
    def img(k: int) -> np.ndarray:
        x = np.arange(18)[None, :, None]
        y = np.arange(12)[:, None, None]
        c = np.arange(3)[None, None, :]
        return (((k + 7) * (x + 3) * (y + 5) + c * 5) % 256).astype(np.uint8)

    near = img(2).copy()
    near[0, 4, :] = (near[0, 4, :].astype(int) + 40) % 256
    images = spark.createDataFrame(
        [(k, bytearray(encode_png(img(k)))) for k in range(6)]
        + [(100, bytearray(encode_png(img(2)))),     # exact duplicate of 2
           (101, bytearray(encode_png(near)))],       # near duplicate of 2
        "item_id long, payload binary",
    )
    pairs = dhash_near_pairs(image_dhash(images), max_hamming=4)
    found = {(r["item_a"], r["item_b"]) for r in pairs.collect()}
    print(f"[dhash] near-dup pairs: {sorted(found)}")
    assert (2, 100) in found and (2, 101) in found and (100, 101) in found

    print("SUCCESS")
    spark.stop()


if __name__ == "__main__":
    main()
