"""Binary field decoders as Catalyst expressions.

Behavioral parity with the reference decode table
(``src/mdp/plugins/transformers/decom.py:21-32,104-124``): uint/int at
8/16/32/64 bits, float32/64, boolean (first-byte truthiness), ASCII
string with trailing-NUL strip, raw-binary hex, both endiannesses.

Everything except IEEE-754 float decode is a native expression chain
(``substring`` → ``hex`` → byte-order shuffle → ``conv`` → width-aware
signed correction), so the decommutation hot path stays inside
whole-stage codegen. Floats use an Arrow-vectorized pandas UDF
(``np.frombuffer``) — there is no Catalyst expression for
float-from-bytes.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


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


@pandas_udf(DoubleType())
def _f32_be(b: pd.Series) -> pd.Series:
    import numpy as np

    return b.map(
        lambda v: float(np.frombuffer(v, dtype=">f4")[0])
        if v is not None and len(v) == 4
        else None
    )


@pandas_udf(DoubleType())
def _f32_le(b: pd.Series) -> pd.Series:
    import numpy as np

    return b.map(
        lambda v: float(np.frombuffer(v, dtype="<f4")[0])
        if v is not None and len(v) == 4
        else None
    )


@pandas_udf(DoubleType())
def _f64_be(b: pd.Series) -> pd.Series:
    import numpy as np

    return b.map(
        lambda v: float(np.frombuffer(v, dtype=">f8")[0])
        if v is not None and len(v) == 8
        else None
    )


@pandas_udf(DoubleType())
def _f64_le(b: pd.Series) -> pd.Series:
    import numpy as np

    return b.map(
        lambda v: float(np.frombuffer(v, dtype="<f8")[0])
        if v is not None and len(v) == 8
        else None
    )


def decode_float(
    data: Column, byte_offset: int, n_bytes: int, little_endian: bool = False
) -> Column:
    """IEEE-754 float32/float64 from bytes (Arrow-batched pandas UDF)."""
    sl = _slice(data, byte_offset, n_bytes)
    if n_bytes == 4:
        return (_f32_le if little_endian else _f32_be)(sl)
    if n_bytes == 8:
        return (_f64_le if little_endian else _f64_be)(sl)
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
