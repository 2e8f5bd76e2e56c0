"""REAL BMP and GIF pixel decode in pure stdlib + NumPy.

Completes the image boundary: PNG and baseline JPEG already decode to
real pixels (`multimodal.py`, `jpeg.py`); this module adds the other
two formats the header probe recognizes, so every recognized image
format now YIELDS PIXELS, not just dimensions.

- **BMP** (Windows DIB, public format): ``BM`` header + BITMAPINFOHEADER,
  uncompressed 24-bit BGR and 8-bit paletted variants, 4-byte row
  padding, bottom-up (or top-down via negative height) row order.
- **GIF** (GIF87a/89a, public spec): logical screen descriptor, global/
  local color tables, extension-block skipping, and a full **LZW
  decoder** (variable 3..12-bit codes, clear/EOI handling, dictionary
  growth) for the first image frame; interlaced frames are
  de-interlaced by the standard 4-pass order.

Both decoders return ``(h, w, 3)`` uint8 RGB or None (sentinel, never
an exception — one dirty payload must not fail an Arrow batch). The
encoders are fixture mirrors: exact, minimal, spec-shaped — GIF's
encoder emits a real LZW stream, so round-trip tests exercise the real
bit-level path both ways.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "encode_bmp",
    "decode_bmp_pixels",
    "encode_gif",
    "decode_gif_pixels",
]


# -- BMP ---------------------------------------------------------------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """24-bit uncompressed BMP from an ``(h, w, 3)`` RGB array
    (bottom-up rows, BGR byte order, 4-byte row padding — the classic
    layout)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("encode_bmp needs an (h, w, 3) RGB array")
    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    bgr = px[:, :, ::-1]
    for y in range(h - 1, -1, -1):  # bottom-up
        row = bgr[y].tobytes()
        body += row + b"\x00" * (stride - len(row))
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                      2835, 2835, 0, 0)
    off = 14 + len(dib)
    hdr = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
    return hdr + dib + bytes(body)


def decode_bmp_pixels(payload: bytes | None):
    """Decode 24-bit BI_RGB and 8-bit paletted BMPs to ``(h, w, 3)``
    RGB; None for anything else (compressed variants, bitfields, 16/32
    bpp, truncation)."""
    try:
        if not payload or len(payload) < 54 or payload[:2] != b"BM":
            return None
        (data_off,) = struct.unpack_from("<I", payload, 10)
        (dib_size,) = struct.unpack_from("<I", payload, 14)
        if dib_size < 40:
            return None
        w, h = struct.unpack_from("<ii", payload, 18)
        planes, bpp = struct.unpack_from("<HH", payload, 26)
        (comp,) = struct.unpack_from("<I", payload, 30)
        if comp != 0 or planes != 1 or w <= 0 or h == 0:
            return None
        top_down = h < 0
        h = abs(h)
        if bpp == 24:
            stride = (w * 3 + 3) & ~3
            need = data_off + stride * h
            if len(payload) < need:
                return None
            rows = np.frombuffer(
                payload, dtype=np.uint8, count=stride * h, offset=data_off
            ).reshape(h, stride)
            img = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]
        elif bpp == 8:
            (ncolors,) = struct.unpack_from("<I", payload, 46)
            ncolors = ncolors or 256
            pal_off = 14 + dib_size
            pal = np.frombuffer(
                payload, dtype=np.uint8, count=4 * ncolors, offset=pal_off
            ).reshape(ncolors, 4)[:, :3][:, ::-1]  # BGRA -> RGB
            stride = (w + 3) & ~3
            need = data_off + stride * h
            if len(payload) < need:
                return None
            rows = np.frombuffer(
                payload, dtype=np.uint8, count=stride * h, offset=data_off
            ).reshape(h, stride)[:, :w]
            if rows.max() >= ncolors:
                return None
            img = pal[rows]
        else:
            return None
        if not top_down:
            img = img[::-1]
        return np.ascontiguousarray(img)
    except Exception:  # noqa: BLE001 - dirty payloads must not fail batches
        return None


# -- GIF ---------------------------------------------------------------------


def _lzw_compress(indices: np.ndarray, min_code: int) -> bytes:
    """Real GIF LZW: emits clear code, variable-width codes growing
    4095-entry dictionary, end-of-information code."""
    clear = 1 << min_code
    eoi = clear + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, w: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear, width)
    cur = b""
    for v in indices.tolist():
        nxt = cur + bytes([v])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur], width)
        if next_code < 4096:
            table[nxt] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code + 1
        cur = bytes([v])
    if cur:
        emit(table[cur], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decompress(data: bytes, min_code: int, n_expected: int):
    clear = 1 << min_code
    eoi = clear + 1
    width = min_code + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    pos = 0
    while len(out) < n_expected:
        while nbits < width:
            if pos >= len(data):
                return None
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            return None
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return bytes(out[:n_expected]) if len(out) >= n_expected else None


def encode_gif(
    indices: np.ndarray, palette: np.ndarray, *, interlace: bool = False
) -> bytes:
    """GIF89a from an ``(h, w)`` index array + ``(n, 3)`` RGB palette
    (n a power of two, 2..256); real LZW stream, optional interlacing
    (the fixture mirror of :func:`decode_gif_pixels`)."""
    idx = np.asarray(indices, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8)
    h, w = idx.shape
    n = pal.shape[0]
    bits = max(1, (n - 1).bit_length())
    if (1 << bits) != n:
        raise ValueError("palette size must be a power of two")
    if idx.max(initial=0) >= n:
        raise ValueError("index out of palette range")
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += pal.tobytes()
    rows = idx
    if interlace:
        order = (
            list(range(0, h, 8))
            + list(range(4, h, 8))
            + list(range(2, h, 4))
            + list(range(1, h, 2))
        )
        rows = idx[order]
    out += struct.pack(
        "<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0
    )
    min_code = max(2, bits)
    out.append(min_code)
    lzw = _lzw_compress(rows.reshape(-1), min_code)
    for i in range(0, len(lzw), 255):
        sub = lzw[i : i + 255]
        out.append(len(sub))
        out += sub
    out += b"\x00"  # block terminator
    out += b"\x3b"  # trailer
    return bytes(out)


def decode_gif_pixels(payload: bytes | None):
    """Decode the FIRST image frame of a GIF87a/89a to ``(h, w, 3)``
    RGB via the full LZW path; interlaced frames de-interlace; local
    color tables override the global one. None for non-GIF, truncated,
    or corrupt-LZW payloads."""
    try:
        if not payload or len(payload) < 13 or payload[:6] not in (
            b"GIF87a", b"GIF89a",
        ):
            return None
        sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
        pos = 13
        gct = None
        if packed & 0x80:
            n = 2 << (packed & 7)
            gct = np.frombuffer(
                payload, dtype=np.uint8, count=3 * n, offset=pos
            ).reshape(n, 3)
            pos += 3 * n
        while pos < len(payload):
            b0 = payload[pos]
            if b0 == 0x21:  # extension: skip sub-blocks
                pos += 2
                while pos < len(payload) and payload[pos]:
                    pos += 1 + payload[pos]
                pos += 1
            elif b0 == 0x2C:  # image descriptor
                _l, _t, w, h, ipacked = struct.unpack_from(
                    "<HHHHB", payload, pos + 1
                )
                pos += 10
                pal = gct
                if ipacked & 0x80:
                    n = 2 << (ipacked & 7)
                    pal = np.frombuffer(
                        payload, dtype=np.uint8, count=3 * n, offset=pos
                    ).reshape(n, 3)
                    pos += 3 * n
                if pal is None or not (w and h):
                    return None
                min_code = payload[pos]
                pos += 1
                lzw = bytearray()
                while pos < len(payload) and payload[pos]:
                    ln = payload[pos]
                    lzw += payload[pos + 1 : pos + 1 + ln]
                    pos += 1 + ln
                raw = _lzw_decompress(bytes(lzw), min_code, w * h)
                if raw is None:
                    return None
                idx = np.frombuffer(raw, dtype=np.uint8).reshape(h, w)
                if ipacked & 0x40:  # interlaced: invert the 4-pass order
                    order = (
                        list(range(0, h, 8))
                        + list(range(4, h, 8))
                        + list(range(2, h, 4))
                        + list(range(1, h, 2))
                    )
                    out = np.empty_like(idx)
                    out[order] = idx
                    idx = out
                if idx.max(initial=0) >= pal.shape[0]:
                    return None
                return np.ascontiguousarray(pal[idx])
            elif b0 == 0x3B:  # trailer
                return None
            else:
                return None
        return None
    except Exception:  # noqa: BLE001 - dirty payloads must not fail batches
        return None
