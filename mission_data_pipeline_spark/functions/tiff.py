"""REAL baseline-TIFF pixel decode in pure stdlib + NumPy.

Extends the image boundary (PNG/JPEG in ``multimodal.py``/``jpeg.py``,
BMP/GIF in ``gif_bmp.py``) with the archival-scan workhorse format —
TIFF 6.0, the baseline subset (public spec):

- both byte orders (``II`` little-endian, ``MM`` big-endian);
- IFD walk with inline-vs-offset value fields resolved per type/count;
- strip organization (``StripOffsets``/``StripByteCounts`` with
  ``RowsPerStrip`` — the format's scan-parallelism unit);
- ``Compression`` 1 (none) and 32773 (**PackBits**, a real RLE codec
  decoded bit-exactly per strip);
- ``PhotometricInterpretation`` 0 (WhiteIsZero — inverted grayscale),
  1 (BlackIsZero), 2 (RGB); 8 bits per sample; chunky planar layout.

Tiled, planar, predictor, LZW, and non-8-bit variants return None
(honest sentinel — never an exception, one dirty payload must not fail
an Arrow batch). The encoder is the fixture mirror: exact, minimal,
spec-shaped, including a real PackBits compressor, so round-trip tests
exercise the real codec path both ways.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "encode_tiff",
    "decode_tiff_pixels",
    "packbits_encode",
    "packbits_decode",
]


def packbits_encode(data: bytes) -> bytes:
    """Apple PackBits RLE (TIFF 6.0 §9): runs of >= 2 identical bytes
    become repeat packets, everything else literal packets, both capped
    at 128."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        j = i + 1
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        if j - i >= 2:  # repeat packet: count byte 257-run
            out.append(257 - (j - i))
            out.append(data[i])
            i = j
            continue
        # literal run: until the next >=2 repeat or the 128 cap
        j = i + 1
        while (
            j < n
            and j - i < 128
            and not (j + 1 < n and data[j + 1] == data[j])
        ):
            j += 1
        out.append(j - i - 1)
        out += data[i:j]
        i = j
    return bytes(out)


def packbits_decode(data: bytes, expected: int) -> bytes | None:
    """Inverse of :func:`packbits_encode`; None on truncation or
    overrun."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < expected:
        b = data[i]
        i += 1
        if b < 128:  # literal: b+1 bytes follow
            if i + b + 1 > n:
                return None
            out += data[i : i + b + 1]
            i += b + 1
        elif b > 128:  # repeat: next byte 257-b times
            if i >= n:
                return None
            out += bytes([data[i]]) * (257 - b)
            i += 1
        # b == 128: no-op
    return bytes(out) if len(out) == expected else None


def encode_tiff(
    pixels: np.ndarray,
    *,
    compression: str = "none",
    photometric: int | None = None,
    rows_per_strip: int = 4,
    big_endian: bool = False,
) -> bytes:
    """Baseline TIFF from an ``(h, w)`` / ``(h, w, 1)`` grayscale or
    ``(h, w, 3)`` RGB uint8 array, written with REAL strip layout and
    (optionally) a real PackBits stream per strip.

    ``photometric`` defaults to 1 (BlackIsZero) for gray and 2 for RGB;
    pass 0 (WhiteIsZero) to store gray INVERTED — the decoder must
    re-invert, which the round-trip tests pin.
    """
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    if px.ndim != 3 or px.shape[2] not in (1, 3):
        raise ValueError("encode_tiff needs (h, w[, 1|3]) uint8")
    h, w, spp = px.shape
    if photometric is None:
        photometric = 2 if spp == 3 else 1
    if photometric == 0 and spp != 1:
        raise ValueError("WhiteIsZero applies to grayscale only")
    stored = (255 - px) if photometric == 0 else px
    comp_id = {"none": 1, "packbits": 32773}[compression]
    e = ">" if big_endian else "<"

    strips = []
    for y0 in range(0, h, rows_per_strip):
        raw = stored[y0 : y0 + rows_per_strip].tobytes()
        strips.append(
            packbits_encode(raw) if comp_id == 32773 else raw
        )
    n_strips = len(strips)

    def entry(tag, typ, cnt, val):
        return struct.pack(e + "HHI", tag, typ, cnt) + val

    def inline_short(v):
        return struct.pack(e + "HH", v, 0)

    def inline_long(v):
        return struct.pack(e + "I", v)

    # layout: header(8) | IFD | [bps array][offsets][bytecounts] | strips
    n_entries = 10
    ifd_size = 2 + n_entries * 12 + 4
    extra_off = 8 + ifd_size
    extra = bytearray()

    def park(buf: bytes) -> int:
        off = extra_off + len(extra)
        extra.extend(buf)
        return off

    if spp == 3:
        bps_val = inline_long(park(struct.pack(e + "3H", 8, 8, 8)))
        bps_cnt = 3
    else:
        bps_val, bps_cnt = inline_short(8), 1
    if n_strips == 1:
        off_val = None  # patched after extras are final
        cnt_val = inline_long(len(strips[0]))
        off_cnt = 1
    else:
        off_val = inline_long(
            park(struct.pack(e + "%dI" % n_strips, *([0] * n_strips)))
        )
        cnt_val = inline_long(
            park(struct.pack(e + "%dI" % n_strips, *map(len, strips)))
        )
        off_cnt = n_strips
    data_off = extra_off + len(extra)
    strip_offs = []
    pos = data_off
    for s in strips:
        strip_offs.append(pos)
        pos += len(s)
    if n_strips == 1:
        off_val = inline_long(strip_offs[0])
    else:
        # patch the parked offsets array now that data_off is known
        arr_pos = struct.unpack(e + "I", off_val)[0] - extra_off
        extra[arr_pos : arr_pos + 4 * n_strips] = struct.pack(
            e + "%dI" % n_strips, *strip_offs
        )

    entries = b"".join(
        [
            entry(256, 4, 1, inline_long(w)),
            entry(257, 4, 1, inline_long(h)),
            entry(258, 3, bps_cnt, bps_val),
            entry(259, 3, 1, inline_short(comp_id)),
            entry(262, 3, 1, inline_short(photometric)),
            entry(273, 4, off_cnt, off_val),
            entry(277, 3, 1, inline_short(spp)),
            entry(278, 4, 1, inline_long(rows_per_strip)),
            entry(279, 4, off_cnt, cnt_val),
            entry(284, 3, 1, inline_short(1)),
        ]
    )
    ifd = struct.pack(e + "H", n_entries) + entries + struct.pack(e + "I", 0)
    hdr = (b"MM" if big_endian else b"II") + struct.pack(e + "HI", 42, 8)
    return hdr + ifd + bytes(extra) + b"".join(strips)


def _read_values(payload, e, typ, cnt, field):
    """IFD entry values: SHORT(3)/LONG(4) arrays, inline when they fit
    the 4-byte field, parked at an offset otherwise."""
    size = 2 if typ == 3 else 4
    fmt = "H" if typ == 3 else "I"
    total = size * cnt
    if total <= 4:
        buf = field[:total]
    else:
        (off,) = struct.unpack(e + "I", field)
        if off + total > len(payload):
            return None
        buf = payload[off : off + total]
    return list(struct.unpack(e + "%d%s" % (cnt, fmt), buf))


def decode_tiff_pixels(payload: bytes | None):
    """Decode baseline TIFF (module docstring) to ``(h, w, c)`` uint8
    with ``c`` 1 (grayscale, WhiteIsZero re-inverted) or 3 (RGB); None
    for foreign/truncated payloads and non-baseline variants."""
    try:
        if not payload or len(payload) < 8:
            return None
        if payload[:4] == b"II*\x00":
            e = "<"
        elif payload[:4] == b"MM\x00*":
            e = ">"
        else:
            return None
        (ifd_off,) = struct.unpack_from(e + "I", payload, 4)
        if ifd_off + 2 > len(payload):
            return None
        (n_entries,) = struct.unpack_from(e + "H", payload, ifd_off)
        if ifd_off + 2 + 12 * n_entries + 4 > len(payload):
            return None
        tags: dict[int, list[int]] = {}
        for i in range(n_entries):
            base = ifd_off + 2 + 12 * i
            tag, typ, cnt = struct.unpack_from(e + "HHI", payload, base)
            if tag in (322, 323, 324, 325):  # tiled layout: not baseline
                return None
            if typ not in (3, 4):
                continue
            vals = _read_values(payload, e, typ, cnt, payload[base + 8 : base + 12])
            if vals is None:
                return None
            tags[tag] = vals
        try:
            w, h = tags[256][0], tags[257][0]
            offsets, counts = tags[273], tags[279]
        except KeyError:
            return None
        comp = tags.get(259, [1])[0]
        photo = tags.get(262, [1])[0]
        spp = tags.get(277, [1])[0]
        rps = tags.get(278, [h])[0] or h
        planar = tags.get(284, [1])[0]
        bps = tags.get(258, [8])
        if (
            comp not in (1, 32773)
            or photo not in (0, 1, 2)
            or spp not in (1, 3)
            or planar != 1
            or any(b != 8 for b in bps)
            or len(offsets) != len(counts)
            or w <= 0
            or h <= 0
        ):
            return None
        if photo == 2 and spp != 3:
            return None
        raw = bytearray()
        for si, (off, cnt) in enumerate(zip(offsets, counts)):
            if off + cnt > len(payload):
                return None
            strip = payload[off : off + cnt]
            rows_here = min(rps, h - si * rps)
            if rows_here <= 0:
                return None
            expected = rows_here * w * spp
            if comp == 32773:
                strip = packbits_decode(strip, expected)
                if strip is None:
                    return None
            elif len(strip) < expected:
                return None
            raw += strip[:expected]
        if len(raw) != h * w * spp:
            return None
        img = np.frombuffer(bytes(raw), dtype=np.uint8).reshape(h, w, spp)
        if photo == 0:
            img = 255 - img
        return np.ascontiguousarray(img)
    except Exception:  # noqa: BLE001 - dirty payloads must not fail batches
        return None
