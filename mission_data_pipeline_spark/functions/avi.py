"""REAL MJPEG-in-AVI video container codec in pure stdlib.

Closes the "video sample decode" stub honestly: Motion JPEG stores
each video frame as a complete baseline JPEG image inside an AVI
(RIFF) container, so the repo's own pure-NumPy baseline JPEG codec
(:mod:`~mission_data_pipeline_spark.functions.jpeg`) decodes real
frames once the container is parsed — no codec library needed.
Inter-frame codecs (H.264/VP9/AV1) genuinely need libraries this
environment lacks and stay behind the loud codec stub.

Container shape (AVI 1.0 / OpenDML subset):

    RIFF 'AVI ' {
      LIST 'hdrl' { 'avih', LIST 'strl' { 'strh' vids/MJPG, 'strf' } }
      LIST 'movi' { '00dc' <jpeg> ... }
      'idx1' (optional)
    }

The parser walks chunks tolerantly (unknown chunks skipped, truncation
degrades to fewer frames or a None sentinel) and the encoder is the
fixture mirror used by tests and oracle queries.

Scale notes: payloads decode independently inside Arrow batches
(``mapInPandas`` callers) — the embarrassingly-parallel shape. Frame
fan-out happens inside the executor task, never on the driver.
"""

from __future__ import annotations

import struct

__all__ = [
    "encode_avi_mjpeg",
    "decode_avi_frames",
    "decode_avi_audio",
    "probe_avi_meta",
]


def _chunk(cid: bytes, body: bytes) -> bytes:
    return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")


def _list(ltype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", ltype + body)


def encode_avi_mjpeg(
    frames: list[bytes],
    *,
    width: int,
    height: int,
    us_per_frame: int = 33333,
    audio: bytes | None = None,
    audio_format: int = 7,
    audio_rate: int = 8000,
    audio_channels: int = 1,
) -> bytes:
    """Minimal REAL AVI/MJPEG encoder (fixture mirror of
    :func:`decode_avi_frames`). Each element of ``frames`` must be a
    complete JPEG payload (e.g. from
    :func:`~mission_data_pipeline_spark.functions.jpeg.encode_jpeg`).

    ``audio`` adds a second (``auds``) stream: the raw coded bytes
    (mu-law tag 7, A-law tag 6, or PCM8 tag 1) split into ``01wb``
    chunks interleaved with the video frames — the standard AVI
    audio-track layout."""
    n = len(frames)
    max_bytes = max((len(f) for f in frames), default=0)
    n_streams = 2 if audio is not None else 1
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        us_per_frame, 0, 0, 0x10, n, 0, n_streams, max_bytes, width,
        height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, us_per_frame, 1_000_000,
                      0, n, max_bytes, 0, 0)
        + struct.pack("<hhhh", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0x47504A4D,  # 'MJPG'
        width * height * 3, 0, 0, 0, 0,
    )
    strls = _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf))
    audio_chunks: list[bytes] = []
    if audio is not None:
        a_strh = (
            b"auds" + b"\x00\x00\x00\x00"
            + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, audio_rate, 0,
                          len(audio) // audio_channels, len(audio), 0, 0)
            + struct.pack("<hhhh", 0, 0, 0, 0)
        )
        # WAVEFORMATEX: tag, channels, rate, avg bytes/s, block align,
        # bits/sample, cb size
        a_strf = struct.pack(
            "<HHIIHHH", audio_format, audio_channels, audio_rate,
            audio_rate * audio_channels, audio_channels, 8, 0,
        )
        strls += _list(
            b"strl", _chunk(b"strh", a_strh) + _chunk(b"strf", a_strf)
        )
        # interleave: one audio chunk per video frame (or one big chunk)
        parts = max(n, 1)
        per = -(-len(audio) // parts)
        audio_chunks = [
            audio[i * per : (i + 1) * per] for i in range(parts)
        ]
    hdrl = _list(b"hdrl", _chunk(b"avih", avih) + strls)
    movi_parts = []
    for i in range(max(n, len(audio_chunks))):
        if i < n:
            movi_parts.append(_chunk(b"00dc", frames[i]))
        if i < len(audio_chunks) and audio_chunks[i]:
            movi_parts.append(_chunk(b"01wb", audio_chunks[i]))
    movi = _list(b"movi", b"".join(movi_parts))
    # idx1: one entry per movi chunk (offset relative to movi body start)
    idx_entries = []
    off = 4  # after the 'movi' fourcc
    for part in movi_parts:
        body_len = struct.unpack("<I", part[4:8])[0]
        idx_entries.append(
            struct.pack("<4sIII", part[:4], 0x10, off, body_len)
        )
        off += len(part)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk_chunks(payload: bytes, lo: int, hi: int):
    """Yield (chunk_id, list_type_or_None, body_lo, body_hi) tolerantly."""
    pos = lo
    while pos + 8 <= hi:
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body_lo = pos + 8
        body_hi = min(body_lo + size, hi)
        if cid == b"LIST" and body_hi - body_lo >= 4:
            yield cid, payload[body_lo : body_lo + 4], body_lo + 4, body_hi
        else:
            yield cid, None, body_lo, body_hi
        if body_lo + size > hi:
            return  # truncated chunk: stop this level
        pos = body_lo + size + (size & 1)


def decode_avi_frames(payload: bytes | None):
    """Parse an AVI payload into ``(meta, frames)``.

    ``meta`` is a dict with ``width``, ``height``, ``us_per_frame``,
    ``total_frames`` (header-declared; None when absent) and
    ``handler`` (fourcc of the first video stream, e.g. ``'MJPG'``);
    ``frames`` is the list of per-frame payload bytes from the movi
    list (compressed ``..dc`` and uncompressed ``..db`` chunks, in
    stream order). Returns None for non-AVI payloads; truncation
    inside movi degrades to the frames parsed so far — the same
    sentinel-not-exception contract as the image/audio decoders."""
    try:
        if (
            not payload
            or len(payload) < 12
            or payload[:4] != b"RIFF"
            or payload[8:12] != b"AVI "
        ):
            return None
        meta = {
            "width": None,
            "height": None,
            "us_per_frame": None,
            "total_frames": None,
            "handler": None,
        }
        frames: list[bytes] = []

        def visit(lo: int, hi: int) -> None:
            for cid, ltype, blo, bhi in _walk_chunks(payload, lo, hi):
                if cid == b"LIST" and ltype in (b"hdrl", b"strl", b"movi"):
                    if ltype == b"movi":
                        for fid, _lt, flo, fhi in _walk_chunks(
                            payload, blo, bhi
                        ):
                            if len(fid) == 4 and fid[2:4] in (b"dc", b"db"):
                                frames.append(payload[flo:fhi])
                    else:
                        visit(blo, bhi)
                elif cid == b"avih" and bhi - blo >= 40:
                    (meta["us_per_frame"],) = struct.unpack(
                        "<I", payload[blo : blo + 4]
                    )
                    (meta["total_frames"],) = struct.unpack(
                        "<I", payload[blo + 16 : blo + 20]
                    )
                    meta["width"], meta["height"] = struct.unpack(
                        "<II", payload[blo + 32 : blo + 40]
                    )
                elif cid == b"strh" and bhi - blo >= 8:
                    if payload[blo : blo + 4] == b"vids" and not meta["handler"]:
                        meta["handler"] = payload[blo + 4 : blo + 8].decode(
                            "ascii", "replace"
                        )

        visit(12, len(payload))
        return meta, frames
    except Exception:  # noqa: BLE001 - dirty payloads must not fail batches
        return None


def decode_avi_audio(payload: bytes | None):
    """Decode the first audio (``auds``) stream of an AVI payload into
    REAL linear samples: ``(samples, rate)`` where ``samples`` is an
    int32 ``(frames, channels)`` array, or None when the payload has no
    decodable audio track.

    Stream resolution follows the AVI contract: the i-th ``strl`` list
    declares stream i, whose movi chunks are tagged ``%02dwb`` — so the
    walk records each stream's type and WAVEFORMATEX, then collects the
    matching chunk ids. Coded bytes decode via the repo's own G.711
    mu-law/A-law tables (format tags 7/6,
    :mod:`~mission_data_pipeline_spark.functions.audio_codecs`) or as
    unsigned PCM8 (tag 1, 8-bit); other tags return None (the honest
    codec boundary). Truncation degrades to the chunks parsed so far."""
    import numpy as np

    from mission_data_pipeline_spark.functions.audio_codecs import (
        decode_alaw,
        decode_ulaw,
    )

    try:
        if (
            not payload
            or len(payload) < 12
            or payload[:4] != b"RIFF"
            or payload[8:12] != b"AVI "
        ):
            return None
        streams: list[tuple[bytes, bytes | None]] = []  # (type, strf)
        chunks: list[bytes] = []
        audio_sid: list[int] = []

        def visit_hdr(lo: int, hi: int) -> None:
            for cid, ltype, blo, bhi in _walk_chunks(payload, lo, hi):
                if cid == b"LIST" and ltype in (b"hdrl", b"strl"):
                    if ltype == b"strl":
                        stype, strf = b"", None
                        for c2, _lt, clo, chi in _walk_chunks(
                            payload, blo, bhi
                        ):
                            if c2 == b"strh" and chi - clo >= 4:
                                stype = payload[clo : clo + 4]
                            elif c2 == b"strf":
                                strf = payload[clo:chi]
                        streams.append((stype, strf))
                    else:
                        visit_hdr(blo, bhi)

        def visit_movi(lo: int, hi: int) -> None:
            for cid, ltype, blo, bhi in _walk_chunks(payload, lo, hi):
                if cid == b"LIST" and ltype == b"movi":
                    want = b"%02dwb" % audio_sid[0]
                    for fid, _lt, flo, fhi in _walk_chunks(
                        payload, blo, bhi
                    ):
                        if fid == want:
                            chunks.append(payload[flo:fhi])

        visit_hdr(12, len(payload))
        sid = next(
            (i for i, (t, f) in enumerate(streams)
             if t == b"auds" and f is not None),
            None,
        )
        if sid is None or len(streams[sid][1]) < 16:
            return None
        audio_sid.append(sid)
        visit_movi(12, len(payload))
        tag, ch, rate = struct.unpack("<HHI", streams[sid][1][:8])
        if not ch:
            return None
        data = b"".join(chunks)
        frames = len(data) // ch
        if frames == 0:
            return None
        data = data[: frames * ch]
        if tag == 7:
            arr = decode_ulaw(data)
        elif tag == 6:
            arr = decode_alaw(data)
        elif tag == 1:
            arr = np.frombuffer(data, dtype="u1").astype(np.int32)
        else:
            return None
        return arr.reshape(frames, ch), int(rate)
    except Exception:  # noqa: BLE001 - dirty payloads must not fail batches
        return None


def probe_avi_meta(payload: bytes | None):
    """Header-only probe: ``(format, width, height, duration_s)`` for
    AVI payloads (duration = us_per_frame x declared frames), or all
    None. Mirrors the MP4 probe's return shape."""
    dec = decode_avi_frames(payload)
    if dec is None:
        return (None, None, None, None)
    meta, _frames = dec
    dur = None
    if meta["us_per_frame"] and meta["total_frames"] is not None:
        dur = meta["us_per_frame"] * meta["total_frames"] / 1_000_000.0
    return ("avi", meta["width"], meta["height"], dur)
