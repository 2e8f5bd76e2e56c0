"""Decom + calibration parity tests (reference
``tests/test_plugins_transformers.py:64-235``)."""

import math
import struct

import pytest
from pyspark.sql import functions as F

from mission_data_pipeline_spark.models.ccsds import build_packet
from mission_data_pipeline_spark.operators import (
    Calibration,
    ParameterDefinition,
    apid_filter,
    apply_calibrations,
    decommutate,
)
from mission_data_pipeline_spark.operators.decom import ParameterType
from mission_data_pipeline_spark.sources import read_packets


@pytest.fixture(scope="module")
def hk_packets(spark, hk_bin):
    return read_packets(spark, hk_bin, sec_hdr_length=4)


HK_DEFS = [
    ParameterDefinition("obc_temp", 0x100, 0, 16, ParameterType.UINT),
    ParameterDefinition("mission_time_s", 0x100, 6, 32, ParameterType.FLOAT),
]


def test_decom_uint16_golden(spark, hk_packets):
    out = decommutate(hk_packets, HK_DEFS)
    r = {x["seq_count"]: x for x in out.filter("name = 'obc_temp'").collect()}
    for i in (0, 5, 100):
        assert r[i]["raw_value"] == int(2048 + 200 * math.sin(i / 20.0))
        assert r[i]["eng_value"] == r[i]["raw_value"]  # eng init = raw


def test_decom_float32_golden(spark, hk_packets):
    out = decommutate(hk_packets, HK_DEFS).filter("name = 'mission_time_s'")
    r = {x["seq_count"]: x["raw_value"] for x in out.collect()}
    assert r[13] == 52.0


def test_decom_unknown_apid_skip(spark, mixed_apid_bin):
    pk = read_packets(spark, mixed_apid_bin)
    out = decommutate(pk, [ParameterDefinition("x", 0x100, 0, 16)])
    assert out.count() == 10  # only 0x100 packets produce rows


def test_decom_unknown_apid_raise(spark, mixed_apid_bin):
    pk = read_packets(spark, mixed_apid_bin)
    out = decommutate(
        pk, [ParameterDefinition("x", 0x100, 0, 16)], skip_unknown_apids=False
    )
    with pytest.raises(Exception, match="unknown APID"):
        out.collect()


def test_decom_short_payload_silently_skipped(spark, tmp_root):
    # one 4-byte-payload packet + one 2-byte; def needs 4 bytes
    p = tmp_root / "short.bin"
    p.write_bytes(
        build_packet(0x10, 0, struct.pack(">I", 7)) + build_packet(0x10, 1, b"\x01\x02")
    )
    pk = read_packets(spark, str(p))
    out = decommutate(pk, [ParameterDefinition("v", 0x10, 0, 32, ParameterType.UINT)])
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["seq_count"] == 0


def test_tai_time_fallback_is_seq_count(spark, hk_packets):
    out = decommutate(hk_packets, HK_DEFS)
    r = out.filter("name = 'obc_temp' AND seq_count = 42").collect()[0]
    assert r["time_tai"] == 42.0


def test_polynomial_golden(spark):
    # reference golden: poly [-273.15, 0.1]: raw 0 -> -273.15, raw 500 -> -223.15
    params = spark.createDataFrame(
        [("t", 0.0, 0.0), ("t", 1.0, 500.0)],
        "name string, time_tai double, raw_value double",
    ).withColumn("eng_value", F.col("raw_value"))
    out = apply_calibrations(params, [Calibration("t", "polynomial", (-273.15, 0.1))])
    r = {x["time_tai"]: x["eng_value"] for x in out.collect()}
    assert r[0.0] == pytest.approx(-273.15)
    assert r[1.0] == pytest.approx(-223.15)


def test_table_interpolation_golden_and_clamp(spark):
    cal = Calibration(
        "t", "table", table_raw=(0, 10, 20), table_eng=(0, 10, 30), unit="u"
    )
    params = spark.createDataFrame(
        [("t", float(i), v) for i, v in enumerate([5.0, 15.0, -3.0, 99.0, 10.0])],
        "name string, time_tai double, raw_value double",
    ).withColumn("eng_value", F.col("raw_value"))
    out = apply_calibrations(params, [cal])
    r = {x["time_tai"]: x["eng_value"] for x in out.collect()}
    assert r[0.0] == pytest.approx(5.0)  # mid segment 1
    assert r[1.0] == pytest.approx(20.0)  # mid segment 2
    assert r[2.0] == pytest.approx(0.0)  # clamp below
    assert r[3.0] == pytest.approx(30.0)  # clamp above
    assert r[4.0] == pytest.approx(10.0)  # exact knot


def test_identity_and_uncalibrated_untouched(spark):
    params = spark.createDataFrame(
        [("a", 3.0), ("b", 4.0)], "name string, raw_value double"
    ).withColumn("eng_value", F.col("raw_value") * 2)
    out = apply_calibrations(params, [Calibration("a", "identity")])
    r = {x["name"]: x for x in out.collect()}
    assert r["a"]["eng_value"] == 3.0  # identity: eng = raw
    assert r["a"]["calibration_id"] == "identity"
    assert r["b"]["eng_value"] == 8.0  # untouched
    assert r["b"]["calibration_id"] is None


def test_non_numeric_sample_kept_unchanged(spark):
    params = spark.createDataFrame(
        [("a", None, "MODE_SAFE", "MODE_SAFE")],
        "name string, raw_value double, raw_value_str string, eng_value_str string",
    ).withColumn("eng_value", F.lit(None).cast("double"))
    out = apply_calibrations(params, [Calibration("a", "polynomial", (1.0, 2.0))])
    r = out.collect()[0]
    assert r["eng_value"] is None and r["eng_value_str"] == "MODE_SAFE"
    assert r["calibration_id"] is None  # not applied


def test_unit_override(spark):
    params = spark.createDataFrame(
        [("a", 1.0, "old"), ("b", 1.0, "keep")],
        "name string, raw_value double, unit string",
    ).withColumn("eng_value", F.col("raw_value"))
    out = apply_calibrations(
        params,
        [Calibration("a", "identity", unit="degC"), Calibration("b", "identity")],
    )
    r = {x["name"]: x["unit"] for x in out.collect()}
    assert r["a"] == "degC" and r["b"] == "keep"


def test_bad_calibration_configs():
    with pytest.raises(ValueError):
        Calibration("x", "table", table_raw=(1,), table_eng=(1,))
    with pytest.raises(ValueError):
        Calibration("x", "bogus")


def test_apid_filter_include_exclude(spark, mixed_apid_bin):
    pk = read_packets(spark, mixed_apid_bin)
    assert apid_filter(pk, include=[0x100, 0x200]).count() == 20
    assert apid_filter(pk, exclude=[0x100]).count() == 20
    assert apid_filter(pk).count() == 30  # passthrough


def test_dataframe_cal_table_path_matches_literal(spark):
    """calibration-as-DataFrame (broadcast join) ≡ calibration-as-config
    (literal dispatch) on the same samples."""
    from mission_data_pipeline_spark.operators.calibration import calibration_table

    cals = [
        Calibration("p", "polynomial", (-55.0, 0.5), unit="degC"),
        Calibration("t", "table", table_raw=(0, 10), table_eng=(0, 100), unit="u"),
        Calibration("i", "identity"),
    ]
    params = spark.createDataFrame(
        [("p", 10.0), ("t", 5.0), ("t", 40.0), ("i", 7.0), ("other", 1.0)],
        "name string, raw_value double",
    ).withColumn("eng_value", F.col("raw_value"))
    lit_rows = sorted(
        apply_calibrations(params, cals).collect(),
        key=lambda r: (r["name"], r["raw_value"]),
    )
    df_rows = sorted(
        apply_calibrations(params, calibration_table(spark, cals)).collect(),
        key=lambda r: (r["name"], r["raw_value"]),
    )
    assert [r.asDict() for r in lit_rows] == [r.asDict() for r in df_rows]


def test_decom_calibrate_is_shuffle_free(spark, hk_bin):
    """Scale-shape guard: config-as-plan-metadata means the entire
    scan → decom → calibrate chain is a narrow pipeline — zero
    exchanges, zero join nodes (the MIB compiles into expressions, so
    the fact side never shuffles)."""
    from mission_data_pipeline_spark.operators import (
        Calibration,
        ParameterDefinition,
        apply_calibrations,
        decommutate,
    )
    from mission_data_pipeline_spark.sources import read_packets

    pk = read_packets(spark, hk_bin, sec_hdr_length=4)
    defs = [ParameterDefinition("obc_temp", 0x100, 0, 16)]
    out = apply_calibrations(
        decommutate(pk, defs),
        [Calibration("obc_temp", "polynomial", (-55.0, 0.04394531), unit="degC")],
    )
    out.collect()
    plan = (
        out._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    # The only exchange allowed is read_packets' range-descriptor
    # repartition (one row PER SCAN RANGE — task distribution, not a
    # data shuffle); packet/param rows must never hash-shuffle and no
    # join node may appear (the MIB compiles into expressions).
    assert "Exchange hashpartitioning" not in plan
    assert "Join" not in plan
