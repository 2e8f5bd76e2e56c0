"""Baseline JPEG codec tests (functions/jpeg.py) — pure Python, no Spark.

The encoder is the fixture mirror (like encode_png/encode_wav); the
decoder must entropy-decode its streams for real. Lossy round-trip →
tolerance asserts on gradients, EXACT asserts on flat colors (the
quantization round-trip of a uniform block is scalar arithmetic — the
same property the x5_jpeg_pixel_stats oracle leans on).
"""

import numpy as np
import pytest

from mission_data_pipeline_spark.functions.jpeg import (
    _Q_CHROMA,
    _Q_LUMA,
    decode_jpeg_pixels,
    encode_jpeg,
    quant_table,
)


def _flat_gray_expect(v: int, quality: int) -> int:
    q00 = int(quant_table(_Q_LUMA, quality)[0])
    dcq = np.floor(8.0 * (v - 128.0) / q00 + 0.5)
    rec = np.floor((dcq * q00 / 8.0) * 1000.0 + 0.5) / 1000.0
    return int(min(255, max(0, np.floor(rec + 128.0 + 0.5))))


def test_flat_gray_exact_all_qualities():
    for quality in (25, 50, 75, 90, 100):
        for v in (0, 1, 77, 128, 200, 255):
            img = np.full((19, 23), v, dtype=np.uint8)
            dec = decode_jpeg_pixels(encode_jpeg(img, quality=quality))
            assert dec.shape == (19, 23, 1)
            got = np.unique(dec)
            assert got.tolist() == [_flat_gray_expect(v, quality)], (
                quality, v,
            )


def test_gradient_roundtrip_gray_and_rgb():
    h, w = 48, 64
    ys, xs = np.mgrid[0:h, 0:w]
    gray = ((xs * 2 + ys * 3) % 256).astype(np.uint8)
    dec = decode_jpeg_pixels(encode_jpeg(gray, quality=95))
    err = np.abs(dec[..., 0].astype(int) - gray.astype(int))
    assert err.mean() < 8 and dec.shape == (h, w, 1)

    rgb = np.stack(
        [(xs * 3) % 256, (ys * 5) % 256, (xs + ys) % 256], axis=-1
    ).astype(np.uint8)
    dec = decode_jpeg_pixels(encode_jpeg(rgb, quality=95))
    err = np.abs(dec.astype(int) - rgb.astype(int))
    assert err.mean() < 12 and dec.shape == (h, w, 3)


@pytest.mark.parametrize("subsample", [(1, 1), (2, 1), (2, 2)])
def test_subsampling_modes_flat_exact_and_smooth_close(subsample):
    # flat color: box-average + replication round-trips exactly
    img = np.full((21, 37, 3), (180, 40, 100), dtype=np.uint8)
    dec = decode_jpeg_pixels(encode_jpeg(img, quality=85, subsample=subsample))
    assert dec is not None and dec.shape == (21, 37, 3)
    assert all(len(np.unique(dec[..., c])) == 1 for c in range(3))
    # smooth gradient survives chroma subsampling within tolerance
    ys, xs = np.mgrid[0:32, 0:40]
    img = np.stack(
        [100 + xs // 2, 80 + ys // 2, 90 + (xs + ys) // 4], axis=-1
    ).astype(np.uint8)
    dec = decode_jpeg_pixels(encode_jpeg(img, quality=90, subsample=subsample))
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.mean() < 6


def test_restart_markers_roundtrip():
    ys, xs = np.mgrid[0:24, 0:56]
    img = ((xs * 7 + ys * 11) % 256).astype(np.uint8)
    plain = decode_jpeg_pixels(encode_jpeg(img, quality=90))
    rst = decode_jpeg_pixels(
        encode_jpeg(img, quality=90, restart_interval=3)
    )
    # restart markers change the byte stream, not the decoded pixels
    assert np.array_equal(plain, rst)


def test_non_multiple_of_8_edges():
    # 1x1 and other awkward sizes: pad-replicate encode, crop decode
    for h, w in ((1, 1), (7, 9), (8, 8), (9, 16), (17, 3)):
        v = (h * 31 + w * 7) % 256
        img = np.full((h, w), v, dtype=np.uint8)
        dec = decode_jpeg_pixels(encode_jpeg(img, quality=75))
        assert dec.shape == (h, w, 1)
        assert np.unique(dec).tolist() == [_flat_gray_expect(v, 75)]


def test_sentinels_never_raise():
    img = np.full((16, 16, 3), 99, dtype=np.uint8)
    enc = encode_jpeg(img, quality=80)
    assert decode_jpeg_pixels(None) is None
    assert decode_jpeg_pixels(b"") is None
    assert decode_jpeg_pixels(b"\x89PNG\r\n\x1a\n") is None
    assert decode_jpeg_pixels(b"\xff\xd8\xff\xd9") is None  # empty JPEG
    assert decode_jpeg_pixels(enc[: len(enc) // 3]) is None  # truncated
    # progressive marker: out of scope, sentinel not exception
    assert decode_jpeg_pixels(enc.replace(b"\xff\xc0", b"\xff\xc2", 1)) is None
    # corrupt entropy data: flip bytes mid-stream
    corrupt = bytearray(enc)
    corrupt[-20:-10] = b"\x00" * 10
    out = decode_jpeg_pixels(bytes(corrupt))
    assert out is None or out.shape == (16, 16, 3)  # never raises


def test_quality_scaling_monotone_size():
    ys, xs = np.mgrid[0:40, 0:40]
    img = ((xs * ys) % 256).astype(np.uint8)
    sizes = [len(encode_jpeg(img, quality=q)) for q in (30, 60, 90)]
    assert sizes[0] < sizes[1] < sizes[2]
    # and the standard chroma table scales too
    assert int(quant_table(_Q_CHROMA, 50)[0]) == 17


def test_decoder_feeds_image_pixel_stats_path():
    # the multimodal integration point: PNG decoder returns None for a
    # JPEG payload, JPEG decoder picks it up (pure function check here;
    # the Spark mapInPandas path is covered by x5_jpeg_pixel_stats)
    from mission_data_pipeline_spark.functions.multimodal import (
        decode_png_pixels,
    )

    img = np.full((10, 12, 3), (10, 250, 60), dtype=np.uint8)
    enc = encode_jpeg(img, quality=90)
    assert decode_png_pixels(enc) is None
    assert decode_jpeg_pixels(enc).shape == (10, 12, 3)
