"""Multimodal plumbing tests (X5): schemas, mapInPandas shape, stubs."""

import pytest
from pyspark.sql import functions as F

from mission_data_pipeline_spark.functions.multimodal import (
    extract_features,
    media_stats,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, b"\x89PNG" + bytes(range(256)) * 4, ("image", "png", 64, 64, 3, None, None)),
        (2, b"RIFF" + bytes(200), ("audio", "wav", None, None, 1, 16000, 2.5)),
        (3, b"\x00\x00ftyp" + bytes(500), ("video", "mp4", 320, 240, 3, None, 10.0)),
        (4, None, ("image", "png", 8, 8, 3, None, None)),
    ]
    return spark.createDataFrame(
        rows,
        "item_id long, payload binary, "
        "meta struct<media_type:string,format:string,width:int,height:int,"
        "n_channels:int,sample_rate:int,duration_s:double>",
    )


def test_extract_features_shape(media):
    out = extract_features(media, dim=16)
    rows = {r["item_id"]: r for r in out.collect()}
    assert len(rows) == 4
    assert len(rows[1]["feature"]) == 16
    assert rows[1]["n_bytes"] == 4 + 256 * 4
    assert rows[4]["feature"] == [0.0] * 16  # null payload → zero vector
    # deterministic: same payload → same feature
    again = {r["item_id"]: r for r in extract_features(media, dim=16).collect()}
    assert rows[1]["feature"] == again[1]["feature"]


def test_real_decoder_is_loud_stub(media):
    with pytest.raises(NotImplementedError, match="codec"):
        extract_features(media, decoder="real")
    with pytest.raises(ValueError):
        extract_features(media, decoder="nope")


def test_sample_frames_fanout(media):
    out = sample_frames(media.filter("item_id = 3"), every_n=50, max_frames=4)
    rows = out.collect()
    assert len(rows) == 4  # 1 row in → 4 frame rows out
    assert [r["frame_idx"] for r in rows] == [0, 50, 100, 150]
    assert all(r["width"] == 320 for r in rows)


def test_media_stats_expression_only(media):
    out = {r["media_type"]: r for r in media_stats(media).collect()}
    assert out["image"]["n_items"] == 2
    assert out["video"]["total_bytes"] == 506
    # no Python UDF in the plan
    plan = media_stats(media)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
