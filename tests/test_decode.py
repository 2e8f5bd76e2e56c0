"""Decode matrix golden + property tests (reference decode table
``src/mdp/plugins/transformers/decom.py:21-32,104-124``)."""

import struct

import pytest
from pyspark.sql import functions as F

from mission_data_pipeline_spark.functions import decode as dec


def _one(spark, payload: bytes, col):
    df = spark.createDataFrame([(payload,)], "data binary")
    return df.select(col.alias("v")).collect()[0]["v"]


CASES_INT = [
    # (fmt, n_bytes, little_endian, signed, values)
    (">B", 1, False, False, [0, 1, 127, 255]),
    (">H", 2, False, False, [0, 1024, 65535]),
    (">I", 4, False, False, [0, 70000, 2**32 - 1]),
    (">b", 1, False, True, [-128, -1, 0, 127]),
    (">h", 2, False, True, [-32768, -1, 0, 32767]),
    (">i", 4, False, True, [-(2**31), -1, 0, 2**31 - 1]),
    ("<H", 2, True, False, [0, 1024, 65535]),
    ("<I", 4, True, False, [0, 70000, 2**32 - 1]),
    ("<h", 2, True, True, [-32768, -1, 32767]),
    ("<i", 4, True, True, [-(2**31), -1, 2**31 - 1]),
]


@pytest.mark.parametrize("fmt,n,le,signed,values", CASES_INT)
def test_int_decode_matrix(spark, fmt, n, le, signed, values):
    for v in values:
        payload = b"\xaa" + struct.pack(fmt, v) + b"\xbb"
        col = (
            dec.decode_int(F.col("data"), 1, n, le)
            if signed
            else dec.decode_uint(F.col("data"), 1, n, le)
        )
        assert _one(spark, payload, col) == v, (fmt, v)


@pytest.mark.parametrize("le", [False, True])
def test_int64_decode(spark, le):
    fmt = "<q" if le else ">q"
    ufmt = "<Q" if le else ">Q"
    for v in [-(2**63), -1, 0, 2**63 - 1]:
        payload = struct.pack(fmt, v)
        assert _one(spark, payload, dec.decode_int(F.col("data"), 0, 8, le)) == v
    for v in [0, 2**64 - 1, 2**63]:
        payload = struct.pack(ufmt, v)
        got = _one(spark, payload, dec.decode_uint(F.col("data"), 0, 8, le))
        assert int(got) == v


@pytest.mark.parametrize("fmt,n,le", [(">f", 4, False), ("<f", 4, True), (">d", 8, False), ("<d", 8, True)])
def test_float_decode(spark, fmt, n, le):
    for v in [0.0, 1.5, -273.15, 3.4e38 if n == 4 else 1.7e308]:
        payload = struct.pack(fmt, v)
        got = _one(spark, payload, dec.decode_float(F.col("data"), 0, n, le))
        assert got == pytest.approx(struct.unpack(fmt, payload)[0], rel=1e-6)


def test_bool_decode(spark):
    assert _one(spark, b"\x01", dec.decode_bool(F.col("data"), 0)) is True
    assert _one(spark, b"\x00", dec.decode_bool(F.col("data"), 0)) is False
    assert _one(spark, b"\xff", dec.decode_bool(F.col("data"), 0)) is True


def test_string_decode_strips_trailing_nuls(spark):
    payload = b"MODE_SAFE\x00\x00\x00"
    got = _one(spark, payload, dec.decode_string(F.col("data"), 0, len(payload)))
    assert got == "MODE_SAFE"


def test_hex_passthrough(spark):
    assert _one(spark, b"\xde\xad\xbe\xef", dec.decode_hex(F.col("data"), 0, 4)) == "DEADBEEF"


def test_tai_fallback(spark):
    df = spark.createDataFrame(
        [(1234.5, 7), (None, 9)], "source_time_tai double, seq_count int"
    )
    got = df.select(
        dec.tai_time(F.col("source_time_tai"), F.col("seq_count")).alias("t")
    ).collect()
    assert [r["t"] for r in got] == [1234.5, 9.0]
