"""Example 07 — mixed-codec media lake + real BPE token budgeting.

No reference counterpart (the reference is telemetry-only). The three
round-6 second-batch capabilities composed into one pass, each in its
100 TB shape:

  1. MIXED-CODEC AUDIO LAKE: one binary column holding PCM, G.711
     mu-law/A-law and IMA ADPCM WAVs side by side — the decode
     dispatches per fmt tag inside Arrow batches
     (functions/audio_codecs.py), perceptual codecs surface as loud
     null sentinels, and exact integer sample statistics come back for
     every decodable row.
  2. REAL VIDEO SAMPLE DECODE: MJPEG-in-AVI payloads parsed by the
     RIFF chunk walker (functions/avi.py), every sampled frame decoded
     by the repo's pure-NumPy baseline JPEG codec — 1 input row fans
     out to per-frame pixel statistics rows, all executor-side.
  3. REAL BPE TOKEN BUDGET: merges learned from the corpus itself
     (distributed word counts, model-sized collect), then applied with
     encode cost proportional to the DISTINCT vocabulary — the honest
     token accounting a mixture-weighting pipeline needs.

Run from the repo root::

    python examples/07_media_lake_tokens.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
from pyspark.sql import functions as F

from mission_data_pipeline_spark import get_spark
from mission_data_pipeline_spark.functions.audio_codecs import (
    encode_ima_adpcm,
    encode_wav_g711,
    encode_wav_ima_adpcm,
)
from mission_data_pipeline_spark.functions.avi import encode_avi_mjpeg
from mission_data_pipeline_spark.functions.jpeg import encode_jpeg
from mission_data_pipeline_spark.functions.multimodal import (
    audio_sample_stats,
    encode_wav,
    video_frame_stats,
)
from mission_data_pipeline_spark.operators.bpe import (
    bpe_token_stats,
    bpe_train,
)


def main() -> None:
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    # 1. mixed-codec audio lake ---------------------------------------
    rng = np.random.default_rng(3)
    rows = []
    for i in range(24):
        sig = (np.sin(np.arange(400) / 9) * 7000).astype(np.int32)
        kind = i % 4
        if kind == 0:
            payload = encode_wav(sig.astype("<i2"), rate=16000)
        elif kind == 1:
            payload = encode_wav_g711(
                bytes(rng.integers(0, 256, 300, dtype=np.uint8)),
                rate=8000, alaw=(i % 8 >= 4),
            )
        elif kind == 2:
            payload = encode_wav_ima_adpcm(
                encode_ima_adpcm(sig, block_align=64),
                rate=16000, channels=1, block_align=64,
            )
        else:  # perceptual codec -> loud sentinel, never fake samples
            p = bytearray(encode_wav(sig.astype("<i2"), rate=16000))
            p[20] = 0x55  # MPEG Layer 3 fmt tag
            payload = bytes(p)
        rows.append((i, bytearray(payload)))
    audio = spark.createDataFrame(rows, "item_id long, payload binary")
    stats = audio_sample_stats(audio)
    decoded = stats.filter(F.col("n_frames").isNotNull()).count()
    sentinels = stats.filter(F.col("n_frames").isNull()).count()
    print(f"[audio] decoded {decoded} mixed-codec WAVs, {sentinels} perceptual sentinels")
    assert decoded == 18 and sentinels == 6

    # 2. real MJPEG-in-AVI video decode -------------------------------
    vids = []
    for i in range(6):
        frames = [
            encode_jpeg(
                np.full((8, 12, 3), [(i * 50 + f * 17) % 256, 90, 170],
                        dtype=np.uint8),
                quality=80,
            )
            for f in range(5)
        ]
        vids.append((i, bytearray(encode_avi_mjpeg(
            frames, width=12, height=8, us_per_frame=33333))))
    video = spark.createDataFrame(vids, "item_id long, payload binary")
    fstats = video_frame_stats(video, every_n=2)
    n_frames = fstats.filter(F.col("px_sum").isNotNull()).count()
    print(f"[video] decoded {n_frames} sampled frames from {len(vids)} AVIs")
    assert n_frames == 6 * 3  # frames 0, 2, 4 of each clip

    # 3. BPE trained on the corpus, then budgeted ---------------------
    texts = [
        "the thermal sensor reported the nominal reading",
        "the reaction wheel reported a nominal spin rate",
        "thermal readings remained nominal during the pass",
        "the sensor pass completed with nominal rates",
    ] * 4
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges = bpe_train(docs, num_merges=30)
    budget = bpe_token_stats(docs, merges).agg(
        F.sum("n_words").alias("words"), F.sum("n_tokens").alias("tokens")
    ).first()
    ratio = budget["tokens"] / budget["words"]
    print(
        f"[bpe] {len(merges)} learned merges; corpus = {budget['words']} "
        f"words -> {budget['tokens']} tokens ({ratio:.2f} tokens/word)"
    )
    assert len(merges) == 30 and budget["tokens"] < budget["words"] * 4
    # repeated corpus words must compress below character count
    assert ratio < 4.0

    print("SUCCESS")
    spark.stop()


if __name__ == "__main__":
    main()
