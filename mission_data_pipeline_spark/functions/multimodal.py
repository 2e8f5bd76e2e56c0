"""Multimodal (image/audio/video) column operators — SURVEY §2.11 X5.

The engine's multimodal data model is the TelemetryPacket pattern
(SURVEY §1.1) generalized: an opaque ``binary`` payload column plus a
typed metadata struct (:data:`MEDIA_META_SCHEMA`).

IMAGE decoding is REAL for every recognized format: PNG pixel decode
(:func:`decode_png_pixels` — chunk walk → zlib IDAT inflate → NumPy
scanline unfilter, all five filters), baseline JPEG entropy decode
(``functions/jpeg.py`` — Huffman, dequantize, matmul-IDCT, chroma
upsample, YCbCr→RGB), and BMP + GIF-with-LZW
(``functions/gif_bmp.py``), all dispatched through
:func:`decode_image_pixels` with encode mirrors for fixtures;
:func:`probe_image_meta` stays the cheap header-only path.
Progressive/arithmetic JPEG streams return the None sentinel. AUDIO decoding is REAL for uncompressed PCM
WAV: :func:`decode_wav_samples` (RIFF walk → NumPy sample view) feeds
:func:`audio_sample_stats` and the real audio features, with
:func:`encode_wav` as the fixture mirror. Compressed audio (MP3/AAC)
and video SAMPLE decode remain STUBBED (``decoder="real"`` raises
``NotImplementedError`` for them) because those genuinely need codec
libraries (ffmpeg/librosa) this environment lacks; ``decoder="fake"``
is their deterministic test double.

Scale shape: decode is embarrassingly parallel and CPU-bound → Arrow
batches through ``mapInPandas`` (never per-row UDFs), with
``repartition`` by payload-size budget so one task never holds more
than ``spark.sql.execution.arrow.maxRecordsPerBatch`` frames in memory.
"""

from __future__ import annotations

import struct
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


_ARROW_BATCH_CONF = "spark.sql.execution.arrow.maxRecordsPerBatch"


class media_arrow_batch_guard:
    """Bound one in-flight ``mapInPandas`` Arrow batch of media
    payloads to ``~target_batch_bytes`` (VERDICT r13 item 5).

    The decode operators stream Arrow batches of up to
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` rows (default
    10,000) — record-COUNT-bounded, not byte-bounded. With real media
    sizes (a 1 MiB JPEG, a 10 MiB clip) one input batch is then
    gigabytes per task and the worker OOMs before the decoder sees a
    byte; the failure scales with FILE size, invisible at fixture
    payloads. This context manager measures the payload-size
    distribution with one column-pruned aggregate (max + mean of
    ``octet_length`` — the scan reads only the size statistics path),
    sets the record cap to ``clamp(target_batch_bytes / max_payload,
    floor, ceil)`` for the duration, and restores the previous value
    on exit::

        with media_arrow_batch_guard(spark, media) as g:
            image_pixel_stats(media).write...   # batches ~<= 64 MiB
        g.records_per_batch  # the cap it chose (diagnostics)

    Sizing by the MAX payload is deliberate: a mean-sized cap still
    lets one batch of tail-sized payloads blow the target; max gives
    a hard ceiling at the cost of smaller batches on skewed corpora
    (per-batch Python overhead is microseconds against millisecond
    decode costs — measured in the r14 decode-throughput probe).
    On a real cluster the same knob travels in the session conf; this
    guard just scopes it to the media stage instead of globally
    penalizing non-media pandas paths."""

    def __init__(
        self,
        spark,
        media: DataFrame,
        *,
        payload_col: str = "payload",
        target_batch_bytes: int = 64 << 20,
        floor: int = 8,
        ceil: int = 4096,
    ) -> None:
        self._spark = spark
        row = media.select(
            F.max(F.octet_length(payload_col)).alias("mx"),
            F.avg(F.octet_length(payload_col)).alias("avg"),
        ).first()
        self.max_payload_bytes = int(row["mx"] or 1)
        self.avg_payload_bytes = float(row["avg"] or 1.0)
        self.records_per_batch = max(
            floor,
            min(ceil, target_batch_bytes // max(self.max_payload_bytes, 1)),
        )

    def __enter__(self) -> "media_arrow_batch_guard":
        self._prev = self._spark.conf.get(_ARROW_BATCH_CONF, None)
        self._spark.conf.set(_ARROW_BATCH_CONF, str(self.records_per_batch))
        return self

    def __exit__(self, *exc) -> None:
        if self._prev is None:
            self._spark.conf.unset(_ARROW_BATCH_CONF)
        else:
            self._spark.conf.set(_ARROW_BATCH_CONF, self._prev)


def peak_batch_bytes(
    media: DataFrame, *, payload_col: str = "payload"
) -> DataFrame:
    """Diagnostic: the ACTUAL per-batch row count and payload bytes the
    media operators would see — one row per Arrow batch, max over the
    result = peak single-batch memory. Used by the r14 decode probe to
    verify :class:`media_arrow_batch_guard` holds its target."""
    cols = media.select(F.col(payload_col).alias("payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "batch_rows": [len(pdf)],
                    "batch_bytes": [
                        int(
                            sum(
                                len(p)
                                for p in pdf["payload"]
                                if p is not None
                            )
                        )
                    ],
                }
            )

    return cols.mapInPandas(
        run, schema="batch_rows long, batch_bytes long"
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


#: Per-item video metadata output of :func:`extract_video_meta`.
VIDEO_META_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType(), False),
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)

_MP4_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def probe_video_meta(
    payload: bytes | None,
) -> tuple[str | None, int | None, int | None, float | None]:
    """REAL video header parse for MP4/ISO-BMFF (box-tree walk) and
    AVI/RIFF (chunk walk, :mod:`~mission_data_pipeline_spark.functions.avi`).

    Returns ``(format, width, height, duration_s)``: for MP4, duration
    from ``moov/mvhd`` (timescale + duration) and dimensions from the
    first ``trak/tkhd`` (16.16 fixed point); for AVI, the ``avih``
    header fields. Pure stdlib — container metadata needs no codec;
    only frame decode does. Unknown payloads → all None; truncated
    boxes degrade to nulls for missing fields.
    """
    if payload and len(payload) >= 12 and payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        from mission_data_pipeline_spark.functions.avi import probe_avi_meta

        return probe_avi_meta(payload)
    if not payload or len(payload) < 12 or payload[4:8] != b"ftyp":
        return (None, None, None, None)
    width = height = None
    timescale = duration = None

    def walk(lo: int, hi: int) -> None:
        nonlocal width, height, timescale, duration
        pos = lo
        while pos + 8 <= hi:
            (size,) = struct.unpack(">I", payload[pos : pos + 4])
            btype = payload[pos + 4 : pos + 8]
            body_lo = pos + 8
            if size == 1:  # ISO-BMFF largesize: 64-bit length after the type
                if pos + 16 > hi:
                    return
                (size,) = struct.unpack(">Q", payload[pos + 8 : pos + 16])
                body_lo = pos + 16
                if size < 16:
                    return
            elif size == 0:  # box extends to the end of the enclosing scope
                size = hi - pos
            elif size < 8:
                return  # malformed box: stop this level
            if pos + size > hi:
                return  # truncated box: stop this level
            body_hi = pos + size
            if btype in _MP4_CONTAINERS:
                walk(body_lo, body_hi)
            elif btype == b"mvhd" and timescale is None and body_lo < body_hi:
                ver = payload[body_lo]
                if ver == 1 and body_lo + 32 <= body_hi:
                    timescale = struct.unpack(
                        ">I", payload[body_lo + 20 : body_lo + 24]
                    )[0]
                    duration = struct.unpack(
                        ">Q", payload[body_lo + 24 : body_lo + 32]
                    )[0]
                elif ver == 0 and body_lo + 20 <= body_hi:
                    timescale, duration = struct.unpack(
                        ">II", payload[body_lo + 12 : body_lo + 20]
                    )
            elif btype == b"tkhd" and width is None and body_lo < body_hi:
                ver = payload[body_lo]
                off = body_lo + (88 if ver == 1 else 76)
                if off + 8 <= body_hi:
                    w_fx, h_fx = struct.unpack(">II", payload[off : off + 8])
                    width, height = w_fx >> 16, h_fx >> 16
            pos += size

    walk(0, len(payload))
    dur_s = (duration / timescale) if timescale and duration is not None else None
    return ("mp4", width, height, dur_s)


def extract_video_meta(
    media: DataFrame, *, id_col: str = "item_id", payload_col: str = "payload"
) -> DataFrame:
    """Parse real MP4 metadata per payload → :data:`VIDEO_META_SCHEMA`
    (Arrow-batched ``mapInPandas``, same contract as the image/audio
    probes)."""
    cols = media.select(
        F.col(id_col).cast("long").alias("item_id"),
        F.col(payload_col).alias("payload"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [probe_video_meta(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "item_id": pdf["item_id"],
                    "format": [m[0] for m in meta],
                    "width": pd.array([m[1] for m in meta], dtype="Int32"),
                    "height": pd.array([m[2] for m in meta], dtype="Int32"),
                    "duration_s": pd.array([m[3] for m in meta], dtype="Float64"),
                    "n_bytes": [
                        len(p) if p is not None else 0 for p in pdf["payload"]
                    ],
                }
            )

    return cols.mapInPandas(run, schema=VIDEO_META_SCHEMA)


#: Per-item image metadata output of :func:`extract_image_meta`.
IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType(), False),
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def probe_image_meta(payload: bytes | None) -> tuple[str | None, int | None, int | None]:
    """REAL image header parse: ``(format, width, height)`` from raw bytes.

    Pure stdlib — understands PNG (IHDR), JPEG (first SOF0-SOF15 frame
    marker, skipping entropy-free segments), GIF87a/89a, BMP
    (BITMAPINFOHEADER), and TIFF (II/MM IFD walk for tags 256/257).
    Unknown/short payloads → ``(None, None, None)``;
    a recognized container whose dimension field is truncated keeps the
    format with null dimensions. CRCs are not validated (metadata probe,
    not integrity check).
    """
    if not payload:
        return (None, None, None)
    if payload[:8] == _PNG_SIG:
        # signature(8) + chunk len(4) + "IHDR"(4) + width(4) + height(4)
        if len(payload) >= 24 and payload[12:16] == b"IHDR":
            w, h = struct.unpack(">II", payload[16:24])
            return ("png", w, h)
        return ("png", None, None)
    if payload[:2] == b"\xff\xd8":
        i, n = 2, len(payload)
        while i + 4 <= n:
            if payload[i] != 0xFF:  # not at a marker: resync forward
                i += 1
                continue
            marker = payload[i + 1]
            if marker in (0xFF, 0x01) or 0xD0 <= marker <= 0xD9:
                i += 2  # fill bytes / standalone markers have no length
                continue
            (seg_len,) = struct.unpack(">H", payload[i + 2 : i + 4])
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 9 <= n:  # SOFn: precision(1), height(2), width(2)
                    h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                    return ("jpeg", w, h)
                return ("jpeg", None, None)
            i += 2 + seg_len
        return ("jpeg", None, None)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        if len(payload) >= 10:
            w, h = struct.unpack("<HH", payload[6:10])
            return ("gif", w, h)
        return ("gif", None, None)
    if payload[:2] == b"BM":
        if len(payload) >= 26:
            w, h = struct.unpack("<ii", payload[18:26])
            return ("bmp", w, abs(h))  # negative height = top-down rows
        return ("bmp", None, None)
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        e = "<" if payload[:2] == b"II" else ">"
        try:
            (ifd,) = struct.unpack_from(e + "I", payload, 4)
            (n,) = struct.unpack_from(e + "H", payload, ifd)
            w = h = None
            for i in range(n):
                tag, typ, _cnt = struct.unpack_from(
                    e + "HHI", payload, ifd + 2 + 12 * i
                )
                if tag in (256, 257) and typ in (3, 4):
                    fmt = "H" if typ == 3 else "I"
                    (v,) = struct.unpack_from(
                        e + fmt, payload, ifd + 2 + 12 * i + 8
                    )
                    if tag == 256:
                        w = v
                    else:
                        h = v
            return ("tiff", w, h)
        except Exception:
            return ("tiff", None, None)
    return (None, None, None)


#: Per-item audio metadata output of :func:`extract_audio_meta`.
AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType(), False),
        T.StructField("format", T.StringType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("bits_per_sample", T.IntegerType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)


def probe_audio_meta(
    payload: bytes | None,
) -> tuple[str | None, int | None, int | None, int | None, float | None]:
    """REAL audio header parse for PCM WAV (RIFF/WAVE chunk walk).

    Returns ``(format, n_channels, sample_rate, bits_per_sample,
    duration_s)``; duration comes from the data chunk size and the fmt
    rates. Non-RIFF payloads → all None; a recognized WAV with missing
    chunks degrades to nulls for the absent fields. Pure stdlib — WAV
    metadata needs no codec library (only full sample decode does).
    FLAC payloads dispatch to the STREAMINFO probe
    (:func:`~mission_data_pipeline_spark.functions.flac.probe_flac_meta`),
    so mixed audio corpora get typed metadata for both containers.
    """
    if payload and payload[:4] == b"fLaC":
        from mission_data_pipeline_spark.functions.flac import (
            probe_flac_meta,
        )

        fmt, ch, rate, bits, n = probe_flac_meta(payload)
        dur = (n / rate) if (fmt and rate and n is not None) else None
        return (fmt, ch, rate, bits, dur)
    if not payload or len(payload) < 12 or payload[:4] != b"RIFF":
        return (None, None, None, None, None)
    if payload[8:12] != b"WAVE":
        return ("riff", None, None, None, None)
    pos, n = 12, len(payload)
    channels = rate = bits = None
    data_size = None
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            channels, rate = struct.unpack("<HI", body[2:8])
            (bits,) = struct.unpack("<H", body[14:16])
        elif cid == b"data":
            data_size = size
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    duration = None
    if data_size is not None and channels and rate and bits:
        bytes_per_s = rate * channels * (bits // 8)
        if bytes_per_s:
            duration = data_size / bytes_per_s
    return ("wav", channels, rate, bits, duration)


def extract_audio_meta(
    media: DataFrame, *, id_col: str = "item_id", payload_col: str = "payload"
) -> DataFrame:
    """Parse real WAV metadata per payload → :data:`AUDIO_META_SCHEMA`
    (Arrow-batched ``mapInPandas``, same contract as
    :func:`extract_image_meta`)."""
    cols = media.select(
        F.col(id_col).cast("long").alias("item_id"),
        F.col(payload_col).alias("payload"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [probe_audio_meta(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "item_id": pdf["item_id"],
                    "format": [m[0] for m in meta],
                    "n_channels": pd.array([m[1] for m in meta], dtype="Int32"),
                    "sample_rate": pd.array([m[2] for m in meta], dtype="Int32"),
                    "bits_per_sample": pd.array([m[3] for m in meta], dtype="Int32"),
                    "duration_s": pd.array([m[4] for m in meta], dtype="Float64"),
                    "n_bytes": [
                        len(p) if p is not None else 0 for p in pdf["payload"]
                    ],
                }
            )

    return cols.mapInPandas(run, schema=AUDIO_META_SCHEMA)


def extract_image_meta(
    media: DataFrame, *, id_col: str = "item_id", payload_col: str = "payload"
) -> DataFrame:
    """Parse real image metadata per payload → :data:`IMAGE_META_SCHEMA`.

    Arrow-batched ``mapInPandas`` over :func:`probe_image_meta`; the
    header probe touches ≤ a few hundred bytes per item, so the cost at
    scale is dominated by payload I/O, not the parse.
    """
    cols = media.select(
        F.col(id_col).cast("long").alias("item_id"),
        F.col(payload_col).alias("payload"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [probe_image_meta(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "item_id": pdf["item_id"],
                    "format": [m[0] for m in meta],
                    "width": pd.array([m[1] for m in meta], dtype="Int32"),
                    "height": pd.array([m[2] for m in meta], dtype="Int32"),
                    "n_bytes": [
                        len(p) if p is not None else 0 for p in pdf["payload"]
                    ],
                }
            )

    return cols.mapInPandas(run, schema=IMAGE_META_SCHEMA)


#: Per-item decoded audio sample statistics — :func:`audio_sample_stats`.
AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType(), False),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("s_sum", T.LongType(), True),
        T.StructField("s_min", T.IntegerType(), True),
        T.StructField("s_max", T.IntegerType(), True),
        T.StructField("s_sumsq", T.LongType(), True),
    ]
)


def encode_wav(samples, *, rate: int = 16000) -> bytes:
    """Minimal REAL PCM WAV encoder (stdlib struct; int16 LE). ``samples``
    is an int16 array of shape (n,) or (n, channels). Fixture/test
    utility — the mirror of :func:`decode_wav_samples`."""
    import numpy as np

    arr = np.asarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr[:, None]
    n, ch = arr.shape
    data = arr.tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav_samples(payload: bytes | None):
    """REAL WAV sample decode with stdlib + NumPy only: RIFF chunk walk
    → fmt dispatch → decoded sample matrix. Supported format codes:

    - 1: uncompressed PCM, 8- or 16-bit
    - 6 / 7: G.711 A-law / mu-law (exact table decode,
      :mod:`~mission_data_pipeline_spark.functions.audio_codecs`)
    - 0x11: IMA/DVI ADPCM (block-adaptive, 4 bits/sample)

    Returns ``(samples, rate)`` with ``samples`` shaped (n_frames,
    channels) as int32, or None for anything it cannot decode
    (non-WAV, truncated data, perceptual codecs) — the same
    sentinel-not-exception boundary as :func:`decode_png_pixels`.
    Perceptual codecs (MP3/AAC/float) stay behind the codec stub.
    A ``fact`` chunk, when present, trims compressed streams to the
    true frame count (last ADPCM block may be partially filled)."""
    import numpy as np

    from mission_data_pipeline_spark.functions.audio_codecs import (
        decode_alaw,
        decode_ima_adpcm,
        decode_ulaw,
    )

    try:
        if (
            not payload
            or len(payload) < 12
            or payload[:4] != b"RIFF"
            or payload[8:12] != b"WAVE"
        ):
            return None
        pos, n = 12, len(payload)
        fmt_body = data = fact_frames = None
        while pos + 8 <= n:
            cid = payload[pos : pos + 4]
            (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
            body = payload[pos + 8 : pos + 8 + size]
            if len(body) < size:
                return None  # truncated chunk
            if cid == b"fmt ":
                fmt_body = body
            elif cid == b"data":
                data = body
            elif cid == b"fact" and size >= 4:
                (fact_frames,) = struct.unpack("<I", body[:4])
            pos += 8 + size + (size & 1)
        if fmt_body is None or data is None or len(fmt_body) < 16:
            return None
        code, ch, rate, _br, balign, bits = struct.unpack(
            "<HHIIHH", fmt_body[:16]
        )
        if not ch:
            return None
        if code == 1 and bits in (8, 16):
            width = bits // 8
            frames = len(data) // (ch * width)
            if frames == 0:
                return None
            data = data[: frames * ch * width]
            dt = "<i2" if bits == 16 else "u1"
            arr = np.frombuffer(data, dtype=dt).astype(np.int32)
            arr = arr.reshape(frames, ch)
        elif code in (6, 7) and bits == 8:
            frames = len(data) // ch
            if frames == 0:
                return None
            dec = decode_alaw if code == 6 else decode_ulaw
            arr = dec(data[: frames * ch]).reshape(frames, ch)
        elif code == 0x11 and bits == 4:
            spb = None
            if len(fmt_body) >= 20:
                (cb_size,) = struct.unpack("<H", fmt_body[16:18])
                if cb_size >= 2:
                    (spb,) = struct.unpack("<H", fmt_body[18:20])
            arr = decode_ima_adpcm(
                data, channels=ch, block_align=balign, samples_per_block=spb
            )
            if arr is None:
                return None
        else:
            return None
        # The fact chunk is authoritative only for compressed codecs
        # (A-law/mu-law/ADPCM, where block padding over-produces frames);
        # for uncompressed PCM it is informational per the WAV spec, so a
        # stale/undersized fact value must not truncate valid samples.
        if fact_frames is not None and code in (6, 7, 0x11):
            arr = arr[:fact_frames]
        if arr.shape[0] == 0:
            return None
        return arr, int(rate)
    except Exception:
        return None


def audio_sample_stats(
    media: DataFrame,
    *,
    id_col: str = "item_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Decoded-sample statistics per PCM WAV payload: (n_frames,
    n_channels, sample_rate, s_sum, s_min, s_max, s_sumsq) on REAL
    samples (:func:`decode_wav_samples`) — exact integers, so the
    oracle can recompute them arithmetically. Undecodable payloads
    yield null-stats sentinel rows. Arrow batches via ``mapInPandas``."""
    return _audio_stats_over(
        media, id_col, payload_col, decode_wav_samples
    )


def avi_audio_sample_stats(
    media: DataFrame,
    *,
    id_col: str = "item_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Same statistics over the AUDIO TRACK of AVI containers: the
    ``auds`` stream's interleaved ``NNwb`` chunks are reassembled and
    G.711/PCM8-decoded to real linear samples
    (:func:`~mission_data_pipeline_spark.functions.avi.decode_avi_audio`).
    Payloads without a decodable audio track yield null sentinels."""
    from mission_data_pipeline_spark.functions.avi import decode_avi_audio

    return _audio_stats_over(media, id_col, payload_col, decode_avi_audio)


def flac_sample_stats(
    media: DataFrame,
    *,
    id_col: str = "item_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Same statistics over REAL FLAC payloads: Rice-coded
    fixed-predictor subframes decoded losslessly to the original
    integers (:func:`~mission_data_pipeline_spark.functions.flac.decode_flac_samples`).
    Undecodable payloads yield null sentinels."""
    from mission_data_pipeline_spark.functions.flac import (
        decode_flac_samples,
    )

    return _audio_stats_over(
        media, id_col, payload_col, decode_flac_samples
    )


def _audio_stats_over(
    media: DataFrame, id_col: str, payload_col: str, decoder
) -> DataFrame:
    cols = media.select(
        F.col(id_col).cast("long").alias("item_id"),
        F.col(payload_col).alias("payload"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for item_id, payload in zip(pdf["item_id"], pdf["payload"]):
                dec = decoder(payload)
                if dec is None:
                    recs.append(
                        (item_id, None, None, None, None, None, None, None)
                    )
                else:
                    s, rate = dec
                    recs.append(
                        (
                            item_id,
                            s.shape[0],
                            s.shape[1],
                            rate,
                            int(s.sum(dtype="int64")),
                            int(s.min()),
                            int(s.max()),
                            int((s.astype("int64") ** 2).sum()),
                        )
                    )
            out = pd.DataFrame(
                recs,
                columns=[
                    "item_id", "n_frames", "n_channels", "sample_rate",
                    "s_sum", "s_min", "s_max", "s_sumsq",
                ],
            )
            for col in ("n_channels", "sample_rate", "s_min", "s_max"):
                out[col] = pd.array(out[col], dtype="Int32")
            for col in ("n_frames", "s_sum", "s_sumsq"):
                out[col] = pd.array(out[col], dtype="Int64")
            yield out

    return cols.mapInPandas(run, schema=AUDIO_STATS_SCHEMA)


#: Per-image decoded pixel statistics — output of :func:`image_pixel_stats`.
PIXEL_STATS_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("px_sum", T.LongType(), True),
        T.StructField("px_min", T.IntegerType(), True),
        T.StructField("px_max", T.IntegerType(), True),
        T.StructField("px_mean", T.DoubleType(), True),
    ]
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: PNG color type → channel count (8-bit depth only).
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png(pixels, *, filters=None) -> bytes:
    """Minimal REAL PNG encoder (stdlib zlib, 8-bit, non-interlaced).

    ``pixels``: uint8 array of shape (h, w) or (h, w, c) with c in
    {1, 2, 3, 4} → color type 0/4/2/6. ``filters``: optional per-row
    filter types (0-4); defaults to all-0. Exists so tests and fixture
    queries can synthesize byte-exact PNGs that exercise every scanline
    filter :func:`decode_png_pixels` must invert — a fixture/test
    utility, not a sink (real pipelines write parquet, not PNG).
    """
    import zlib

    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    flt = list(filters) if filters is not None else [0] * h
    raw = arr.reshape(h, w * c).astype(np.int16)
    out = []
    prior = np.zeros(w * c, dtype=np.int16)
    for y in range(h):
        row, f = raw[y], flt[y]
        if f == 0:
            enc = row.copy()
        elif f == 2:
            enc = (row - prior) % 256
        else:
            enc = np.empty_like(row)
            for i in range(w * c):
                a = int(row[i - c]) if i >= c else 0
                b = int(prior[i])
                d = int(prior[i - c]) if i >= c else 0
                if f == 1:
                    enc[i] = (int(row[i]) - a) % 256
                elif f == 3:
                    enc[i] = (int(row[i]) - (a + b) // 2) % 256
                else:  # 4
                    enc[i] = (int(row[i]) - _paeth(a, b, d)) % 256
        out.append(bytes([f]) + enc.astype(np.uint8).tobytes())
        prior = row

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    idat = zlib.compress(b"".join(out))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def decode_png_pixels(payload: bytes | None):
    """REAL PNG pixel decode with ONLY stdlib zlib + NumPy: chunk walk,
    IDAT inflate, scanline unfilter (all five filter types). Returns a
    uint8 array of shape (h, w, channels), or None for anything it
    cannot decode (non-PNG, interlaced, depth != 8, palette, truncated,
    corrupt deflate) — at scale one dirty payload must never fail the
    Arrow batch, so the boundary is a sentinel, not an exception.

    Sub/Average/Paeth unfiltering is inherently sequential along a
    scanline (each byte needs the reconstructed left neighbor), so those
    rows run a Python loop; Up/None vectorize whole-row. Parallelism at
    scale comes from images-per-batch across tasks, not from within one
    image — the same shape a codec library would have.
    """
    import zlib

    import numpy as np

    try:
        if not payload or not payload.startswith(_PNG_SIG):
            return None
        pos, ihdr, idat = len(_PNG_SIG), None, []
        while pos + 8 <= len(payload):
            (ln,) = struct.unpack_from(">I", payload, pos)
            tag = payload[pos + 4 : pos + 8]
            body = payload[pos + 8 : pos + 8 + ln]
            if len(body) < ln:
                return None  # truncated chunk
            if tag == b"IHDR":
                ihdr = body
            elif tag == b"IDAT":
                idat.append(body)
            elif tag == b"IEND":
                break
            pos += 12 + ln  # len + tag + body + crc
        if ihdr is None or not idat:
            return None
        w, h, depth, color_type, comp, filt, interlace = struct.unpack(
            ">IIBBBBB", ihdr
        )
        c = _PNG_CHANNELS.get(color_type)
        if depth != 8 or c is None or comp or filt or interlace or not (w and h):
            return None
        stride = w * c
        expected = h * (stride + 1)
        # Bounded inflate: a corrupt/hostile IDAT can claim tiny
        # dimensions yet inflate to gigabytes — cap decompression at
        # expected+1 so a decompression bomb costs one byte over budget,
        # not a task OOM, and is rejected by the length check.
        d = zlib.decompressobj()
        data = d.decompress(b"".join(idat), expected + 1)
        if len(data) != expected:  # short = truncated; expected+1 = bomb
            return None
        rows = np.frombuffer(data, dtype=np.uint8).reshape(h, stride + 1)
        recon = np.zeros((h, stride), dtype=np.uint8)
        prior = np.zeros(stride, dtype=np.int16)
        for y in range(h):
            f, enc = int(rows[y, 0]), rows[y, 1:].astype(np.int16)
            if f == 0:
                rec = enc
            elif f == 2:
                rec = (enc + prior) % 256
            elif f == 1:
                # recon[i] = enc[i] + recon[i-c]: per-channel cumsum mod 256
                rec = enc.copy()
                for off in range(c):
                    rec[off::c] = np.cumsum(rec[off::c]) % 256
            elif f in (3, 4):
                rec = np.empty_like(enc)
                for i in range(stride):
                    a = int(rec[i - c]) if i >= c else 0
                    b = int(prior[i])
                    d = int(prior[i - c]) if i >= c else 0
                    pred = (a + b) // 2 if f == 3 else _paeth(a, b, d)
                    rec[i] = (int(enc[i]) + pred) % 256
            else:
                return None  # invalid filter type
            recon[y] = rec.astype(np.uint8)
            prior = rec
        return recon.reshape(h, w, c)
    except Exception:
        return None


def decode_image_pixels(payload: bytes | None):
    """Unified REAL pixel decode across every recognized still-image
    format: PNG (:func:`decode_png_pixels`), baseline JPEG
    (:func:`~mission_data_pipeline_spark.functions.jpeg.decode_jpeg_pixels`),
    BMP and GIF-with-LZW
    (:mod:`~mission_data_pipeline_spark.functions.gif_bmp`), and
    baseline TIFF with strips + PackBits
    (:mod:`~mission_data_pipeline_spark.functions.tiff`). Dispatch
    is by magic bytes (each decoder rejects foreign payloads cheaply);
    returns ``(h, w, c)`` uint8 or None."""
    from mission_data_pipeline_spark.functions.gif_bmp import (
        decode_bmp_pixels,
        decode_gif_pixels,
    )
    from mission_data_pipeline_spark.functions.jpeg import decode_jpeg_pixels
    from mission_data_pipeline_spark.functions.tiff import decode_tiff_pixels

    for dec in (
        decode_png_pixels,
        decode_jpeg_pixels,
        decode_bmp_pixels,
        decode_gif_pixels,
        decode_tiff_pixels,
    ):
        px = dec(payload)
        if px is not None:
            return px
    return None


def image_pixel_stats(
    media: DataFrame,
    *,
    id_col: str = "item_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Decoded-pixel statistics per image payload — PNG, baseline JPEG,
    BMP, or GIF (:func:`decode_image_pixels`):
    (width, height, channels, px_sum, px_min, px_max, px_mean) — the
    feature-extraction step of a multimodal curation pipeline, run on
    REAL pixels, not headers. Undecodable payloads yield null
    stats rows (sentinel, never a task failure). Arrow batches through
    ``mapInPandas``; per-image work is independent, so the operator
    scales with partitions like any map."""
    cols = media.select(
        F.col(id_col).cast("long").alias("item_id"),
        F.col(payload_col).alias("payload"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for item_id, payload in zip(pdf["item_id"], pdf["payload"]):
                px = decode_image_pixels(payload)
                if px is None:
                    recs.append((item_id, None, None, None, None, None, None, None))
                else:
                    h, w, c = px.shape
                    s = int(px.sum(dtype="int64"))
                    recs.append(
                        (
                            item_id,
                            w,
                            h,
                            c,
                            s,
                            int(px.min()),
                            int(px.max()),
                            round(s / (h * w * c), 6),
                        )
                    )
            out = pd.DataFrame(
                recs,
                columns=[
                    "item_id", "width", "height", "channels",
                    "px_sum", "px_min", "px_max", "px_mean",
                ],
            )
            for col in ("width", "height", "channels", "px_min", "px_max"):
                out[col] = pd.array(out[col], dtype="Int32")
            out["px_sum"] = pd.array(out["px_sum"], dtype="Int64")
            yield out

    return cols.mapInPandas(run, schema=PIXEL_STATS_SCHEMA)


def _real_image_feature(payload: bytes | None, dim: int) -> list[float]:
    """Real image feature vector. For a fully-decodable PNG
    (:func:`decode_png_pixels`) or baseline JPEG
    (:func:`~mission_data_pipeline_spark.functions.jpeg
    .decode_jpeg_pixels`): [width, height, aspect, size, pixel mean,
    pixel std, pixel min, pixel max] prefix — REAL pixel statistics,
    not header guesses — PNG, baseline JPEG, BMP and GIF all decode to
    real pixels now (:func:`decode_image_pixels`). For the remaining
    header-only case (progressive JPEG): [width, height, aspect, size]
    from the header parse. Both fall back to a byte-histogram fold for
    remaining dims.

    Null or unrecognized payloads (not PNG/JPEG/GIF/BMP) yield the all-zero
    sentinel vector rather than raising: at scale one dirty row must never
    fail the whole ``mapInPandas`` task.
    """
    px = decode_image_pixels(payload)
    if px is not None:
        h, w, c = px.shape
        pf = px.astype("float64")
        head = [
            float(w), float(h), float(w) / h, float(len(payload)),
            float(pf.mean()), float(pf.std()), float(px.min()), float(px.max()),
        ]
        return (head + _fake_feature(payload, dim))[:dim] if dim > 8 else head[:dim]
    fmt, w, h = probe_image_meta(payload)
    if fmt is None:
        return [0.0] * dim
    n = float(len(payload))
    head = [float(w or 0), float(h or 0), (float(w) / h) if w and h else 0.0, n]
    return (head + _fake_feature(payload, dim))[:dim] if dim > 4 else head[:dim]


def _real_audio_feature(payload: bytes | None, dim: int) -> list[float]:
    """Real audio feature vector from decoded PCM WAV samples
    (:func:`decode_wav_samples`): [n_frames, channels, rate, size,
    sample mean, RMS, min, max] prefix + byte-histogram fold. Anything
    not uncompressed PCM (MP3/AAC/float WAV) still raises the codec
    stub — compressed audio genuinely needs libraries this environment
    lacks, and faking it would violate the real-not-fake contract."""
    import numpy as np

    dec = decode_wav_samples(payload)
    if dec is None:
        _require_real_decoder("audio")()
    s, rate = dec
    sf = s.astype("float64")
    head = [
        float(s.shape[0]), float(s.shape[1]), float(rate), float(len(payload)),
        float(sf.mean()), float(np.sqrt((sf**2).mean())),
        float(s.min()), float(s.max()),
    ]
    return (head + _fake_feature(payload, dim))[:dim] if dim > 8 else head[:dim]


def _real_video_feature(payload: bytes | None, dim: int) -> list[float]:
    """Real video feature vector from an MJPEG-in-AVI payload: [frame
    count, width, height, us_per_frame, size, first-frame pixel mean,
    min, max] prefix + byte-histogram fold. Anything that is not an
    AVI container still raises the codec stub — inter-frame codecs
    (H.264/VP9/…) genuinely need libraries this environment lacks."""
    from mission_data_pipeline_spark.functions.avi import decode_avi_frames
    from mission_data_pipeline_spark.functions.jpeg import decode_jpeg_pixels

    dec = decode_avi_frames(payload)
    if dec is None:
        _require_real_decoder("video")()
    meta, frames = dec
    first = decode_jpeg_pixels(frames[0]) if frames else None
    head = [
        float(len(frames)),
        float(meta["width"] or 0),
        float(meta["height"] or 0),
        float(meta["us_per_frame"] or 0),
        float(len(payload)),
        0.0 if first is None else float(first.mean()),
        0.0 if first is None else float(first.min()),
        0.0 if first is None else float(first.max()),
    ]
    return (head + _fake_feature(payload, dim))[:dim] if dim > 8 else head[:dim]


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
    double for every modality). ``decoder='real'``: REAL features —
    decoded-pixel statistics for PNG and baseline-JPEG images / header
    fields for other image formats (:func:`_real_image_feature`), decoded-sample
    statistics for PCM / G.711 / IMA-ADPCM WAV audio
    (:func:`_real_audio_feature`), frame + first-frame pixel statistics
    for MJPEG-in-AVI video (:func:`_real_video_feature`),
    byte-histogram for ``'text'``; perceptual audio codecs (MP3/AAC)
    and inter-frame video codecs (H.264/…) raise
    ``NotImplementedError`` at execution (the remaining stub boundary —
    those codecs genuinely need libraries this environment lacks).
    Null or unknown modalities yield the all-zero sentinel vector
    (never silently fake).
    """
    if decoder not in ("fake", "real"):
        raise ValueError("decoder must be 'fake' or 'real'")

    cols = media.select(
        F.col(id_col).cast("long").alias("item_id"),
        F.col(payload_col).alias("payload"),
        F.col(f"{meta_col}.media_type").alias("media_type"),
    )

    def one_feature(payload: bytes, media_type: str) -> list[float]:
        if decoder == "fake":
            return _fake_feature(payload, dim)
        if media_type == "image":
            return _real_image_feature(payload, dim)
        if media_type == "audio":
            return _real_audio_feature(payload, dim)
        if media_type == "video":
            return _real_video_feature(payload, dim)
        if media_type == "text":
            return _fake_feature(payload, dim)  # byte histogram IS real for text
        return [0.0] * dim  # null/unknown modality: zero sentinel, never fake

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "item_id": pdf["item_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [
                        len(p) if p is not None else 0 for p in pdf["payload"]
                    ],
                    "feature": [
                        one_feature(p, m)
                        for p, m in zip(pdf["payload"], pdf["media_type"])
                    ],
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

    ``decoder='fake'`` synthesizes ``max_frames`` frames whose pixel
    buffer is a deterministic slice of the payload — exercising the
    real fan-out shape (1 input row → many output rows through
    mapInPandas). ``decoder='real'`` parses MJPEG-in-AVI containers
    (:mod:`~mission_data_pipeline_spark.functions.avi`), takes every
    ``every_n``-th frame and decodes it with the repo's baseline JPEG
    codec: ``pixels`` is the RAW decoded uint8 buffer (h·w·c bytes),
    ``frame_idx`` the source frame number, width/height the DECODED
    dimensions. Non-AVI payloads or undecodable frames yield null
    pixel sentinels; inter-frame codecs stay behind the codec stub."""
    if decoder not in ("fake", "real"):
        raise ValueError("decoder must be 'fake' or 'real'")

    cols = media.select(
        F.col(id_col).cast("long").alias("item_id"),
        F.col(payload_col).alias("payload"),
        F.col(f"{meta_col}.width").alias("width"),
        F.col(f"{meta_col}.height").alias("height"),
    )

    def run_fake(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
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

    def run_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from mission_data_pipeline_spark.functions.avi import decode_avi_frames
        from mission_data_pipeline_spark.functions.jpeg import decode_jpeg_pixels

        step = max(every_n, 1)
        for pdf in batches:
            rows = []
            for item_id, payload in zip(pdf["item_id"], pdf["payload"]):
                dec = decode_avi_frames(payload)
                if dec is None:
                    rows.append(
                        {
                            "item_id": item_id,
                            "frame_idx": -1,
                            "width": None,
                            "height": None,
                            "pixels": None,
                        }
                    )
                    continue
                _meta, frames = dec
                for fi in range(0, len(frames), step)[:max_frames]:
                    px = decode_jpeg_pixels(frames[fi])
                    rows.append(
                        {
                            "item_id": item_id,
                            "frame_idx": fi,
                            "width": None if px is None else px.shape[1],
                            "height": None if px is None else px.shape[0],
                            "pixels": None if px is None else px.tobytes(),
                        }
                    )
            out = pd.DataFrame(
                rows, columns=[f.name for f in FRAMES_SCHEMA.fields]
            ) if rows else pd.DataFrame(
                {f.name: [] for f in FRAMES_SCHEMA.fields}
            )
            for col in ("width", "height"):
                out[col] = pd.array(out[col], dtype="Int32")
            yield out

    return cols.mapInPandas(
        run_real if decoder == "real" else run_fake, schema=FRAMES_SCHEMA
    )


#: Per-sampled-frame decoded pixel statistics (:func:`video_frame_stats`).
VIDEO_FRAME_STATS_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("px_sum", T.LongType(), True),
        T.StructField("px_min", T.IntegerType(), True),
        T.StructField("px_max", T.IntegerType(), True),
    ]
)


def video_frame_stats(
    media: DataFrame,
    *,
    id_col: str = "item_id",
    payload_col: str = "payload",
    every_n: int = 1,
    max_frames: int = 32,
) -> DataFrame:
    """REAL video sample decode: MJPEG-in-AVI container parse
    (:mod:`~mission_data_pipeline_spark.functions.avi`) → every-Nth
    frame through the pure-NumPy baseline JPEG codec → exact integer
    pixel statistics per sampled frame (1 input row → many output
    rows). Non-AVI payloads yield a single null-stats sentinel row
    (frame_idx NULL); an undecodable individual frame yields a
    null-stats row with its frame_idx. Arrow batches via
    ``mapInPandas``; frame fan-out happens executor-side."""
    from mission_data_pipeline_spark.functions.avi import decode_avi_frames
    from mission_data_pipeline_spark.functions.jpeg import decode_jpeg_pixels

    cols = media.select(
        F.col(id_col).cast("long").alias("item_id"),
        F.col(payload_col).alias("payload"),
    )
    step = max(every_n, 1)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for item_id, payload in zip(pdf["item_id"], pdf["payload"]):
                dec = decode_avi_frames(payload)
                if dec is None:
                    recs.append(
                        (item_id, None, None, None, None, None, None, None)
                    )
                    continue
                _meta, frames = dec
                for fi in range(0, len(frames), step)[:max_frames]:
                    px = decode_jpeg_pixels(frames[fi])
                    if px is None:
                        recs.append(
                            (item_id, fi, None, None, None, None, None, None)
                        )
                    else:
                        h, w, c = px.shape
                        recs.append(
                            (
                                item_id, fi, w, h, c,
                                int(px.sum(dtype="int64")),
                                int(px.min()),
                                int(px.max()),
                            )
                        )
            out = pd.DataFrame(
                recs,
                columns=[
                    "item_id", "frame_idx", "width", "height", "channels",
                    "px_sum", "px_min", "px_max",
                ],
            )
            for col in ("frame_idx", "width", "height", "channels",
                        "px_min", "px_max"):
                out[col] = pd.array(out[col], dtype="Int32")
            out["px_sum"] = pd.array(out["px_sum"], dtype="Int64")
            yield out

    return cols.mapInPandas(run, schema=VIDEO_FRAME_STATS_SCHEMA)


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


#: Resize output: resized payload (lossless PNG) + its decoded stats.
RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("px_sum", T.LongType(), True),
        T.StructField("px_min", T.IntegerType(), True),
        T.StructField("px_max", T.IntegerType(), True),
    ]
)


def resize_images(
    media: DataFrame,
    *,
    width: int,
    height: int,
    id_col: str = "item_id",
    payload_col: str = "payload",
) -> DataFrame:
    """REAL image resize over Arrow batches: decode (PNG, baseline
    JPEG, BMP, or GIF — every real decoder), nearest-neighbor sample to
    ``width x height``, re-encode as lossless PNG. The standard
    decode→resize step of a multimodal curation pipeline, with no codec
    library anywhere. Undecodable payloads yield a null row (sentinel,
    never a task failure).

    Nearest-neighbor with the floor mapping
    ``src_index = (dst_index * src_size) // dst_size`` — pure integer
    arithmetic, so any engine (and the SQL oracle) reproduces the
    resized pixels exactly; no float kernel, no rounding convention to
    mirror. Per-image work is independent: the operator scales with
    partitions like any map, and the output payload is PNG so a
    downstream :func:`image_pixel_stats` / :func:`resize_images` chain
    composes losslessly.
    """
    import numpy as np

    if width < 1 or height < 1:
        raise ValueError("resize target must be at least 1x1")

    cols = media.select(
        F.col(id_col).cast("long").alias("item_id"),
        F.col(payload_col).alias("payload"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for item_id, payload in zip(pdf["item_id"], pdf["payload"]):
                px = decode_image_pixels(payload)
                if px is None:
                    recs.append(
                        (item_id, None, None, None, None, None, None, None)
                    )
                    continue
                sh, sw, c = px.shape
                ys = (np.arange(height) * sh) // height
                xs = (np.arange(width) * sw) // width
                out = px[ys[:, None], xs[None, :], :]
                recs.append(
                    (
                        item_id,
                        width,
                        height,
                        c,
                        bytearray(encode_png(out)),
                        int(out.sum(dtype="int64")),
                        int(out.min()),
                        int(out.max()),
                    )
                )
            out_pdf = pd.DataFrame(
                recs,
                columns=[
                    "item_id", "width", "height", "channels",
                    "payload", "px_sum", "px_min", "px_max",
                ],
            )
            for col in ("width", "height", "channels", "px_min", "px_max"):
                out_pdf[col] = pd.array(out_pdf[col], dtype="Int32")
            out_pdf["px_sum"] = pd.array(out_pdf["px_sum"], dtype="Int64")
            yield out_pdf

    return cols.mapInPandas(run, schema=RESIZE_SCHEMA)


#: Per-image difference-hash — output of :func:`image_dhash`.
DHASH_SCHEMA = T.StructType(
    [
        T.StructField("item_id", T.LongType(), False),
        T.StructField("dhash", T.LongType(), True),
    ]
)


def image_dhash(
    media: DataFrame,
    *,
    id_col: str = "item_id",
    payload_col: str = "payload",
) -> DataFrame:
    """64-bit difference hash (dHash) per image — the standard cheap
    perceptual fingerprint for IMAGE near-duplicate detection in a
    multimodal training corpus (crop-resistant enough for exact and
    re-encoded duplicates; pair selection via
    :func:`~mission_data_pipeline_spark.operators.dedup.dhash_near_pairs`).

    Every step is integer-exact so a SQL oracle can recompute the hash
    bit-for-bit from pixel values: REAL decode (PNG/JPEG/BMP/GIF),
    integer luma ``(299R + 587G + 114B) // 1000`` (single channel used
    directly for grayscale), nearest-neighbor floor-resample to a 9x8
    luma grid (``src = (dst * size) // 9``, same convention as
    :func:`resize_images`), then bit ``ty*8+tx`` is set iff
    ``luma[ty][tx+1] > luma[ty][tx]``. The 64-bit value is exposed as a
    SIGNED long (bit 63 → sign bit) so both engines carry the same
    8-byte representation. Undecodable payloads yield a null hash.

    Scale shape: per-image map over Arrow batches; the hash table this
    emits is what shuffles downstream (8 bytes/image, never pixels).
    """
    import numpy as np

    cols = media.select(
        F.col(id_col).cast("long").alias("item_id"),
        F.col(payload_col).alias("payload"),
    )

    def one(payload) -> int | None:
        px = decode_image_pixels(payload)
        if px is None:
            return None
        px = px.astype(np.int64)
        c = px.shape[2]
        if c >= 3:
            gray = (299 * px[:, :, 0] + 587 * px[:, :, 1]
                    + 114 * px[:, :, 2]) // 1000
        else:  # grayscale / gray+alpha: the luma IS channel 0
            gray = px[:, :, 0]
        h, w = gray.shape
        ys = (np.arange(8) * h) // 8
        xs = (np.arange(9) * w) // 9
        g = gray[ys[:, None], xs[None, :]]
        bits = g[:, 1:] > g[:, :-1]
        val = 0
        for ty in range(8):
            for tx in range(8):
                if bits[ty, tx]:
                    val |= 1 << (ty * 8 + tx)
        return val - (1 << 64) if val >= (1 << 63) else val

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "item_id": pdf["item_id"],
                    "dhash": pd.array(
                        [one(p) for p in pdf["payload"]], dtype="Int64"
                    ),
                }
            )
            yield out

    return cols.mapInPandas(run, schema=DHASH_SCHEMA)
