"""G.711 + IMA ADPCM compressed-audio decode (functions/audio_codecs.py).

Every decoder is checked against an independently written scalar
reference implementation of the published codec spec (ITU-T G.711
CCITT formulas; IMA ADPCM step-table recursion), not against itself.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from mission_data_pipeline_spark.functions.audio_codecs import (
    ALAW_TABLE,
    IMA_INDEX_ADJUST,
    IMA_STEP_TABLE,
    ULAW_TABLE,
    decode_ima_adpcm,
    encode_ima_adpcm,
    encode_wav_g711,
    encode_wav_ima_adpcm,
    ima_samples_per_block,
)
from mission_data_pipeline_spark.functions.multimodal import (
    audio_sample_stats,
    decode_wav_samples,
)


def _ref_ulaw(byte: int) -> int:
    u = ~byte & 0xFF
    t = (((u & 15) << 3) + 132) << ((u >> 4) & 7)
    return (132 - t) if (u & 0x80) else (t - 132)


def _ref_alaw(byte: int) -> int:
    a = byte ^ 0x55
    t = (a & 15) << 4
    seg = (a >> 4) & 7
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t = (t + 0x108) << (seg - 1)
    return t if (a & 0x80) else -t


def _ref_adpcm(pred: int, idx: int, nibbles) -> list[int]:
    out = [pred]
    for n in nibbles:
        step = int(IMA_STEP_TABLE[idx])
        diff = (step >> 3) + ((step >> 2) if n & 1 else 0)
        diff += ((step >> 1) if n & 2 else 0) + (step if n & 4 else 0)
        pred = pred - diff if n & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + int(IMA_INDEX_ADJUST[n])))
        out.append(pred)
    return out


def test_g711_tables_match_spec_reference():
    assert [int(v) for v in ULAW_TABLE] == [_ref_ulaw(b) for b in range(256)]
    assert [int(v) for v in ALAW_TABLE] == [_ref_alaw(b) for b in range(256)]
    # spec anchors: 0xFF is mu-law zero; extremes are +/-32124 (mu) and
    # +/-32256 (A); A-law has no zero code (min magnitude 8)
    assert ULAW_TABLE[0xFF] == 0 and ULAW_TABLE[0x7F] == 0
    assert ULAW_TABLE[0x00] == -32124 and ULAW_TABLE[0x80] == 32124
    assert ALAW_TABLE.min() == -32256 and ALAW_TABLE.max() == 32256
    assert np.abs(ALAW_TABLE).min() == 8


@pytest.mark.parametrize("alaw", [False, True])
@pytest.mark.parametrize("channels", [1, 2])
def test_g711_wav_roundtrip(alaw, channels):
    coded = bytes((k * 31 + 5) % 256 for k in range(120))
    wav = encode_wav_g711(coded, rate=8000, channels=channels, alaw=alaw)
    dec = decode_wav_samples(wav)
    assert dec is not None
    samples, rate = dec
    ref = _ref_alaw if alaw else _ref_ulaw
    expected = np.array([ref(b) for b in coded]).reshape(-1, channels)
    assert rate == 8000
    assert samples.shape == expected.shape
    assert (samples == expected).all()
    # truncation -> sentinel, not garbage
    assert decode_wav_samples(wav[: len(wav) // 2]) is None


@pytest.mark.parametrize("channels", [1, 2])
def test_ima_adpcm_decode_matches_scalar_reference(channels):
    rng = np.random.default_rng(11)
    block_align = 4 * channels + 4 * channels * 3
    spb = ima_samples_per_block(block_align, channels)
    blocks = b""
    expect = [[] for _ in range(channels)]
    for _ in range(6):
        body = bytes(
            rng.integers(0, 256, block_align - 4 * channels, dtype=np.uint8)
        )
        hdrs = b""
        for c in range(channels):
            p = int(rng.integers(-32768, 32768))
            i0 = int(rng.integers(0, 89))
            hdrs += struct.pack("<hBB", p, i0, 0)
            nibbles = []
            group_w = 4 * channels
            for g in range(len(body) // group_w):
                for byte in body[g * group_w + c * 4 : g * group_w + c * 4 + 4]:
                    nibbles += [byte & 15, byte >> 4]
            expect[c].extend(_ref_adpcm(p, i0, nibbles[: spb - 1]))
        blocks += hdrs + body
    dec = decode_ima_adpcm(
        blocks, channels=channels, block_align=block_align
    )
    expected = np.array(expect).T
    assert dec.shape == expected.shape
    assert (dec == expected).all()


def test_ima_adpcm_wav_container_fact_trim_and_sentinels():
    blocks = bytes([0x10, 0x00, 5, 0]) + bytes(range(8))
    wav = encode_wav_ima_adpcm(
        blocks, rate=11025, channels=1, block_align=12, n_frames=14
    )
    dec = decode_wav_samples(wav)
    assert dec is not None
    samples, rate = dec
    assert rate == 11025
    assert samples.shape == (14, 1)  # fact chunk trims 17 -> 14
    nibbles = []
    for byte in range(8):
        nibbles += [byte & 15, byte >> 4]
    assert [int(v) for v in samples[:, 0]] == _ref_adpcm(16, 5, nibbles)[:14]
    assert decode_wav_samples(wav[:30]) is None  # truncated
    no_block = encode_wav_ima_adpcm(
        b"\x00\x00", rate=11025, channels=1, block_align=12
    )
    assert decode_wav_samples(no_block) is None  # no complete block


def test_ima_adpcm_encoder_tracks_signal_and_decoder_agrees():
    x = (np.sin(np.arange(3000) / 25) * 9000).astype(np.int32)
    coded = encode_ima_adpcm(x, block_align=256)
    wav = encode_wav_ima_adpcm(
        coded, rate=16000, channels=1, block_align=256
    )
    samples, _ = decode_wav_samples(wav)
    n = samples.shape[0]
    assert n > 2000
    err = np.abs(samples[:, 0] - x[:n])
    assert err.mean() < 200  # tracks within the local step size
    # vectorized decode == scalar replay of the first block's bytes
    spb = ima_samples_per_block(256, 1)
    pred0, idx0 = struct.unpack("<hB", coded[:3])
    nibbles = []
    for byte in coded[4 : 4 + (spb - 1) // 2]:
        nibbles += [byte & 15, byte >> 4]
    assert [int(v) for v in samples[:spb, 0]] == _ref_adpcm(
        pred0, idx0, nibbles[: spb - 1]
    )


def test_audio_sample_stats_mixed_compressed_formats(spark):
    """One DataFrame mixing PCM, mu-law, A-law and ADPCM payloads plus a
    perceptual-format sentinel: the operator decodes each per its fmt
    tag — exactly what a mixed 100 TB audio lake looks like."""
    from mission_data_pipeline_spark.functions.multimodal import encode_wav

    pcm = encode_wav(np.arange(50, dtype="<i2") * 100, rate=16000)
    ulaw = encode_wav_g711(bytes(range(60)), rate=8000, channels=1)
    alaw = encode_wav_g711(
        bytes(range(40)), rate=8000, channels=2, alaw=True
    )
    blocks = bytes([0x10, 0x00, 5, 0]) + bytes(range(8))
    adpcm = encode_wav_ima_adpcm(
        blocks, rate=11025, channels=1, block_align=12
    )
    mp3ish = bytearray(pcm)
    mp3ish[20] = 0x55  # MPEG Layer 3 format tag -> sentinel
    rows = [
        (0, bytearray(pcm)),
        (1, bytearray(ulaw)),
        (2, bytearray(alaw)),
        (3, bytearray(adpcm)),
        (4, bytearray(bytes(mp3ish))),
    ]
    media = spark.createDataFrame(rows, "item_id long, payload binary")
    got = {
        r["item_id"]: r
        for r in audio_sample_stats(media).collect()
    }
    assert got[0]["n_frames"] == 50 and got[0]["sample_rate"] == 16000
    assert got[1]["n_frames"] == 60
    assert got[1]["s_sum"] == sum(_ref_ulaw(b) for b in range(60))
    assert got[2]["n_frames"] == 20 and got[2]["n_channels"] == 2
    assert got[2]["s_sum"] == sum(_ref_alaw(b) for b in range(40))
    assert got[3]["n_frames"] == 17 and got[3]["sample_rate"] == 11025
    assert got[4]["n_frames"] is None  # perceptual codec -> loud sentinel
