"""REAL compressed-audio decoders in pure stdlib + NumPy.

Closes the "compressed audio" stub honestly for the three compressed
formats whose decode is pure integer arithmetic and therefore needs no
codec library:

- **G.711 mu-law** (WAV format tag 7) — ITU-T G.711 logarithmic PCM,
  2:1 vs int16. Decode is the classic CCITT table formula.
- **G.711 A-law** (WAV format tag 6) — same, European variant.
- **IMA/DVI ADPCM** (WAV format tag 0x11) — 4:1 block-adaptive delta
  PCM with an 89-entry step-size table and per-nibble predictor state.

All three decoders are exact integer functions of the coded bytes, so
a SQL oracle can re-derive every decoded sample: G.711 is a stateless
per-byte formula; IMA ADPCM is a per-block recursion expressible as a
recursive CTE.  Perceptual codecs (MP3/AAC/Opus/float formats) remain
behind the loud codec stub — those genuinely need libraries this
environment lacks.

Scale notes: decode is embarrassingly parallel per payload and runs
NumPy-vectorized inside Arrow batches (``mapInPandas`` callers).  The
ADPCM inner loop is sequential over samples-within-a-block (inherent
to the codec: each nibble updates predictor state) but vectorized
across all blocks x channels of a payload, which is the same
parallelism shape a native decoder uses.

The reference pipeline (northflowlabs/mission-data-pipeline) has no
multimodal surface at all; this module is part of the beyond-reference
multimodal family (SURVEY.md X5).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "ULAW_TABLE",
    "ALAW_TABLE",
    "IMA_STEP_TABLE",
    "IMA_INDEX_ADJUST",
    "decode_ulaw",
    "decode_alaw",
    "decode_ima_adpcm",
    "encode_ima_adpcm",
    "encode_wav_g711",
    "encode_wav_ima_adpcm",
    "ima_samples_per_block",
]


def _build_ulaw_table() -> np.ndarray:
    """ITU-T G.711 mu-law byte -> linear int16, CCITT reference formula:
    u = ~byte; t = ((u & 0xF) << 3 + 0x84) << ((u >> 4) & 7);
    sample = 0x84 - t if (u & 0x80) else t - 0x84."""
    out = np.empty(256, dtype=np.int32)
    for byte in range(256):
        u = ~byte & 0xFF
        t = (((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 0x07)
        out[byte] = (0x84 - t) if (u & 0x80) else (t - 0x84)
    return out


def _build_alaw_table() -> np.ndarray:
    """ITU-T G.711 A-law byte -> linear int16, CCITT reference formula
    (even-bit inversion with 0x55, segment 0/1 special cases)."""
    out = np.empty(256, dtype=np.int32)
    for byte in range(256):
        a = byte ^ 0x55
        t = (a & 0x0F) << 4
        seg = (a >> 4) & 0x07
        if seg == 0:
            t += 8
        elif seg == 1:
            t += 0x108
        else:
            t = (t + 0x108) << (seg - 1)
        out[byte] = t if (a & 0x80) else -t
    return out


#: 256-entry G.711 decode tables (int32, values in [-8031, 8031] x4 range).
ULAW_TABLE = _build_ulaw_table()
ALAW_TABLE = _build_alaw_table()

#: IMA ADPCM step-size table (89 entries) and per-nibble index adjustment.
IMA_STEP_TABLE = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
        34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
        143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408,
        449, 494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282,
        1411, 1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327,
        3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630,
        9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500, 20350,
        22385, 24623, 27086, 29794, 32767,
    ],
    dtype=np.int32,
)
IMA_INDEX_ADJUST = np.array(
    [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8],
    dtype=np.int32,
)


def decode_ulaw(data: bytes) -> np.ndarray:
    """Decode G.711 mu-law bytes to linear samples (int32, int16 range)."""
    return ULAW_TABLE[np.frombuffer(data, dtype=np.uint8)]


def decode_alaw(data: bytes) -> np.ndarray:
    """Decode G.711 A-law bytes to linear samples (int32, int16 range)."""
    return ALAW_TABLE[np.frombuffer(data, dtype=np.uint8)]


def ima_samples_per_block(block_align: int, channels: int) -> int:
    """Samples per channel per IMA block: 1 header sample + 2 nibbles
    per data byte, data bytes split evenly across channels."""
    return (block_align - 4 * channels) * 2 // channels + 1


def decode_ima_adpcm(
    data: bytes,
    *,
    channels: int,
    block_align: int,
    samples_per_block: int | None = None,
) -> np.ndarray | None:
    """Decode IMA/DVI ADPCM (WAV format tag 0x11) block stream.

    Block layout per the IMA WAV mapping: per channel a 4-byte header
    (predictor int16 LE = sample 0, step index u8, reserved u8), then
    4-byte nibble groups round-robin across channels; within a byte
    the LOW nibble is the earlier sample.  Per nibble ``n``::

        step = STEP_TABLE[index]
        diff = step>>3 + (n&1 ? step>>2 : 0) + (n&2 ? step>>1 : 0)
               + (n&4 ? step : 0)
        predictor += (n&8 ? -diff : +diff)   # clamp to int16
        index += INDEX_ADJUST[n]             # clamp to [0, 88]

    Sequential over samples within a block (codec-inherent) but
    vectorized across blocks x channels.  Returns (frames, channels)
    int32, or None when no complete block exists.
    """
    if samples_per_block is None:
        samples_per_block = ima_samples_per_block(block_align, channels)
    if block_align < 4 * channels or samples_per_block < 1:
        return None
    n_blocks = len(data) // block_align
    if n_blocks == 0:
        return None
    raw = np.frombuffer(
        data[: n_blocks * block_align], dtype=np.uint8
    ).reshape(n_blocks, block_align)
    hdr = raw[:, : 4 * channels].reshape(n_blocks, channels, 4)
    pred = hdr[:, :, 0].astype(np.int32) | (hdr[:, :, 1].astype(np.int32) << 8)
    pred = np.where(pred >= 32768, pred - 65536, pred)
    index = np.clip(hdr[:, :, 2].astype(np.int32), 0, 88)

    body = raw[:, 4 * channels :]
    n_groups = body.shape[1] // (4 * channels)
    n_samples = min(samples_per_block - 1, n_groups * 8)
    out = np.empty((n_blocks, channels, n_samples + 1), dtype=np.int32)
    out[..., 0] = pred
    if n_samples:
        grp = body[:, : n_groups * 4 * channels].reshape(
            n_blocks, n_groups, channels, 4
        )
        nib = np.empty((n_blocks, n_groups, channels, 8), dtype=np.uint8)
        nib[..., 0::2] = grp & 0x0F
        nib[..., 1::2] = grp >> 4
        # (blocks, channels, samples-1) in playback order
        nib = nib.transpose(0, 2, 1, 3).reshape(n_blocks, channels, -1)
        cur, idx = pred.copy(), index.copy()
        for s in range(n_samples):
            n = nib[..., s].astype(np.int32)
            step = IMA_STEP_TABLE[idx]
            diff = (
                (step >> 3)
                + np.where(n & 1, step >> 2, 0)
                + np.where(n & 2, step >> 1, 0)
                + np.where(n & 4, step, 0)
            )
            cur = np.clip(
                np.where(n & 8, cur - diff, cur + diff), -32768, 32767
            )
            idx = np.clip(idx + IMA_INDEX_ADJUST[n], 0, 88)
            out[..., s + 1] = cur
    # (frames, channels) with blocks concatenated in time order
    return out.transpose(0, 2, 1).reshape(-1, channels)


def encode_ima_adpcm(
    samples,
    *,
    block_align: int,
) -> bytes:
    """REAL IMA ADPCM encoder (fixture mirror of :func:`decode_ima_adpcm`).

    Standard greedy quantizer: per sample emit the nibble whose decoded
    diff best tracks the target delta, updating the SAME predictor
    state the decoder will reproduce — so decode(encode(x)) is the
    canonical ADPCM approximation of ``x`` (bounded by the local step
    size).  ``samples`` is int16-range, shape (n,) or (n, channels).
    The final partial block is dropped (spec-typical)."""
    arr = np.asarray(samples, dtype=np.int32)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, channels = arr.shape
    spb = ima_samples_per_block(block_align, channels)
    n_blocks = n // spb
    out = bytearray()
    for b in range(n_blocks):
        blk = arr[b * spb : (b + 1) * spb]
        pred = blk[0].copy()
        idx = np.zeros(channels, dtype=np.int32)
        nibbles = np.empty((spb - 1, channels), dtype=np.uint8)
        for s in range(1, spb):
            step = IMA_STEP_TABLE[idx]
            delta = blk[s] - pred
            sign = (delta < 0).astype(np.int32) * 8
            mag = np.abs(delta)
            n3 = (mag >= step).astype(np.int32) * 4
            mag = mag - n3 // 4 * step
            n2 = (mag >= step >> 1).astype(np.int32) * 2
            mag = mag - n2 // 2 * (step >> 1)
            n1 = (mag >= step >> 2).astype(np.int32)
            code = (sign | n3 | n2 | n1).astype(np.int32)
            diff = (
                (step >> 3)
                + np.where(code & 1, step >> 2, 0)
                + np.where(code & 2, step >> 1, 0)
                + np.where(code & 4, step, 0)
            )
            pred = np.clip(
                np.where(code & 8, pred - diff, pred + diff), -32768, 32767
            )
            idx = np.clip(idx + IMA_INDEX_ADJUST[code], 0, 88)
            nibbles[s - 1] = code
        for ch in range(channels):
            p = int(blk[0, ch]) & 0xFFFF
            out += struct.pack("<HBB", p, 0, 0)
        # pack nibbles: per channel 4-byte groups, low nibble first
        n_groups = (spb - 1) // 8
        for g in range(n_groups):
            for ch in range(channels):
                for byte_i in range(4):
                    lo = nibbles[g * 8 + byte_i * 2, ch]
                    hi = nibbles[g * 8 + byte_i * 2 + 1, ch]
                    out.append(int(lo) | (int(hi) << 4))
        pad = block_align - (4 * channels + n_groups * 4 * channels)
        out += b"\x00" * pad
    return bytes(out)


def _riff(fmt_body: bytes, data: bytes, fact_frames: int | None) -> bytes:
    chunks = b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
    if len(fmt_body) & 1:
        chunks += b"\x00"
    if fact_frames is not None:
        chunks += b"fact" + struct.pack("<II", 4, fact_frames)
    chunks += b"data" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def encode_wav_g711(
    coded: bytes,
    *,
    rate: int = 8000,
    channels: int = 1,
    alaw: bool = False,
) -> bytes:
    """Wrap already-coded G.711 bytes in a WAV container (format tag 6
    A-law / 7 mu-law, 8 bits per coded sample).  Fixture utility — the
    container mirror of the :func:`decode_ulaw`/:func:`decode_alaw`
    dispatch in ``decode_wav_samples``."""
    tag = 6 if alaw else 7
    frames = len(coded) // channels
    fmt = struct.pack(
        "<HHIIHHH", tag, channels, rate, rate * channels, channels, 8, 0
    )
    return _riff(fmt, coded, frames)


def encode_wav_ima_adpcm(
    coded: bytes,
    *,
    rate: int = 8000,
    channels: int = 1,
    block_align: int,
    n_frames: int | None = None,
) -> bytes:
    """Wrap IMA ADPCM block bytes in a WAV container (format tag 0x11,
    4 bits per sample, cbSize=2 extension carrying samples-per-block,
    plus the spec-required ``fact`` chunk with the true frame count)."""
    spb = ima_samples_per_block(block_align, channels)
    if n_frames is None:
        n_frames = (len(coded) // block_align) * spb
    byte_rate = (rate * block_align + spb - 1) // spb
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, channels, rate, byte_rate, block_align, 4, 2, spb
    )
    return _riff(fmt, coded, n_frames)
