"""Binary field decoders as Catalyst expressions.

Behavioral parity with the reference decode table
(``src/mdp/plugins/transformers/decom.py:21-32,104-124``): uint/int at
8/16/32/64 bits, float32/64, boolean (first-byte truthiness), ASCII
string with trailing-NUL strip, raw-binary hex, both endiannesses.

Everything — floats included — is a native expression chain
(``substring`` → ``hex`` → byte-order shuffle → ``conv`` → width-aware
signed correction; IEEE-754 via exact sign/exponent/mantissa arithmetic),
so the decommutation hot path stays entirely inside whole-stage codegen
with no Arrow round-trip of the payload column.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def slice_bytes(data: Column, byte_offset: int, n_bytes: int) -> Column:
    """Byte slice of a BinaryType column (1-based substring under the hood)."""
    return F.substring(data, byte_offset + 1, n_bytes)


_slice = slice_bytes


def _hex_be(data: Column, byte_offset: int, n_bytes: int, little_endian: bool) -> Column:
    """Hex string of the field in big-endian digit order.

    For little-endian fields the per-byte hex pairs are re-concatenated
    in reverse — constant-folded structure, still pure expressions.
    """
    h = F.hex(_slice(data, byte_offset, n_bytes))
    if not little_endian:
        return h
    pairs = [F.substring(h, 2 * i + 1, 2) for i in reversed(range(n_bytes))]
    return F.concat(*pairs)


def decode_uint(
    data: Column, byte_offset: int, n_bytes: int, little_endian: bool = False
) -> Column:
    """Unsigned big-int decode.

    Returns LongType for widths ≤ 4 bytes; DecimalType(20,0) for 8-byte
    fields (uint64 exceeds LongType range — SURVEY §7.3 overflow care).
    """
    v = F.conv(_hex_be(data, byte_offset, n_bytes, little_endian), 16, 10)
    if n_bytes >= 8:
        return v.cast("decimal(20,0)")
    return v.cast("long")


def decode_int(
    data: Column, byte_offset: int, n_bytes: int, little_endian: bool = False
) -> Column:
    """Two's-complement signed decode for 1/2/4/8-byte widths."""
    bits = 8 * n_bytes
    if n_bytes >= 8:
        u = F.conv(_hex_be(data, byte_offset, n_bytes, little_endian), 16, 10).cast(
            "decimal(20,0)"
        )
        # 2^63 / 2^64 exceed the JVM long literal range — ship as strings
        half = F.lit(str(1 << (bits - 1))).cast("decimal(20,0)")
        full = F.lit(str(1 << bits)).cast("decimal(21,0)")
        return F.when(u >= half, (u - full).cast("decimal(20,0)")).otherwise(
            u.cast("decimal(20,0)")
        ).cast("long")
    u = F.conv(_hex_be(data, byte_offset, n_bytes, little_endian), 16, 10).cast("long")
    return F.when(u >= F.lit(1 << (bits - 1)), u - F.lit(1 << bits)).otherwise(u)


_NAN = float("nan")
_INF = float("inf")


def _f32_from_bits(bits: Column) -> Column:
    """IEEE-754 binary32 value from its bit pattern (LongType, 0..2^32).

    Every step is exact in double arithmetic: the mantissa (≤ 2^24) and
    every needed power of two are exactly representable, and the final
    product *is* the decoded float's value, so the one rounding that
    occurs lands on it exactly.
    """
    sign = F.shiftright(bits, 31).bitwiseAND(F.lit(1))
    exp = F.shiftright(bits, 23).bitwiseAND(F.lit(0xFF))
    frac = bits.bitwiseAND(F.lit(0x7FFFFF)).cast("double")
    sgn = F.when(sign == 1, F.lit(-1.0)).otherwise(F.lit(1.0))
    return (
        F.when(
            exp == 255,
            F.when(frac != 0.0, F.lit(_NAN)).otherwise(sgn * F.lit(_INF)),
        )
        .when(exp == 0, sgn * frac * F.lit(2.0**-149))
        .otherwise(
            sgn
            * (frac + F.lit(float(1 << 23)))
            * F.pow(F.lit(2.0), exp.cast("double") - F.lit(150.0))
        )
    )


def _f64_from_words(hi: Column, lo: Column) -> Column:
    """IEEE-754 binary64 value from its high/low 32-bit words (LongType)."""
    sign = F.shiftright(hi, 31).bitwiseAND(F.lit(1))
    exp = F.shiftright(hi, 20).bitwiseAND(F.lit(0x7FF))
    # 52-bit fraction < 2^53: exactly representable as a double
    frac = hi.bitwiseAND(F.lit(0xFFFFF)).cast("double") * F.lit(
        float(1 << 32)
    ) + lo.cast("double")
    sgn = F.when(sign == 1, F.lit(-1.0)).otherwise(F.lit(1.0))
    return (
        F.when(
            exp == 2047,
            F.when(frac != 0.0, F.lit(_NAN)).otherwise(sgn * F.lit(_INF)),
        )
        .when(exp == 0, sgn * frac * F.lit(2.0**-1074))
        .otherwise(
            sgn
            * (frac + F.lit(float(1 << 52)))
            * F.pow(F.lit(2.0), exp.cast("double") - F.lit(1075.0))
        )
    )


def decode_float(
    data: Column, byte_offset: int, n_bytes: int, little_endian: bool = False
) -> Column:
    """IEEE-754 float32/float64 from bytes — pure Catalyst expressions.

    The bit pattern comes out of ``conv(hex(...), 16, 10)`` (endianness
    handled by hex-pair reversal), then sign/exponent/mantissa arithmetic
    reconstructs the value exactly (see ``_f32_from_bits``). Keeping this
    JVM-side means decommutation of float parameters stays inside
    whole-stage codegen — no Arrow round-trip of the payload column.
    Short/missing fields decode to null (parity with the previous UDF).
    """
    sl = _slice(data, byte_offset, n_bytes)
    guard = F.length(sl) == n_bytes
    hx = _hex_be(data, byte_offset, n_bytes, little_endian)
    if n_bytes == 4:
        bits = F.conv(hx, 16, 10).cast("long")
        return F.when(guard, _f32_from_bits(bits))
    if n_bytes == 8:
        hi = F.conv(F.substring(hx, 1, 8), 16, 10).cast("long")
        lo = F.conv(F.substring(hx, 9, 8), 16, 10).cast("long")
        return F.when(guard, _f64_from_words(hi, lo))
    raise ValueError(f"float width must be 4 or 8 bytes, got {n_bytes}")


def decode_bool(data: Column, byte_offset: int) -> Column:
    """First-byte truthiness (reference ``decom.py:114-115``)."""
    return F.conv(F.hex(_slice(data, byte_offset, 1)), 16, 10).cast("long") != 0


def decode_string(data: Column, byte_offset: int, n_bytes: int) -> Column:
    """ASCII decode with trailing-NUL strip (reference ``decom.py:117-118``)."""
    s = F.decode(_slice(data, byte_offset, n_bytes), "US-ASCII")
    return F.regexp_replace(s, "\x00+$", "")


def decode_hex(data: Column, byte_offset: int, n_bytes: int) -> Column:
    """Raw-binary passthrough rendered as an uppercase hex string."""
    return F.hex(_slice(data, byte_offset, n_bytes))


def tai_time(source_time_tai: Column, seq_count: Column) -> Column:
    """Sample-time fallback: source TAI else float(seq_count)
    (reference ``decom.py:127-131``)."""
    return F.coalesce(source_time_tai, seq_count.cast("double"))
