"""CSV telemetry scan tests (reference ``src/mdp/plugins/extractors/csv.py``)."""

import math

import pytest

from mission_data_pipeline_spark.sources import read_csv_telemetry


def test_melt_to_long(spark, csv_file):
    df = read_csv_telemetry(spark, csv_file)
    names = {r["name"] for r in df.select("name").distinct().collect()}
    assert names == {"star_tracker_temp", "reaction_wheel_rpm"}
    r = df.filter("name = 'star_tracker_temp' AND seq_count = 0").collect()[0]
    assert r["raw_value"] == pytest.approx(2200.0)
    assert r["eng_value"] == r["raw_value"]  # eng = raw at extract
    assert r["apid"] == 768 and r["time_tai"] == 0.0


def test_nan_cells_dropped(spark, csv_file):
    df = read_csv_telemetry(spark, csv_file)
    st = df.filter("name = 'star_tracker_temp'").count()
    rw = df.filter("name = 'reaction_wheel_rpm'").count()
    assert st == 50 - len([i for i in range(50) if i % 7 == 3])
    assert rw == 50 - len([i for i in range(50) if i % 11 == 5])


def test_explicit_parameter_columns(spark, csv_file):
    df = read_csv_telemetry(spark, csv_file, parameter_columns=["star_tracker_temp"])
    assert df.select("name").distinct().count() == 1


def test_missing_required_column(spark, tmp_root):
    p = tmp_root / "bad.csv"
    p.write_text("a,b\n1,2\n")
    with pytest.raises(ValueError, match="required"):
        read_csv_telemetry(spark, str(p))


def test_values_match_formula(spark, csv_file):
    df = read_csv_telemetry(spark, csv_file)
    rows = {
        r["seq_count"]: r["raw_value"]
        for r in df.filter("name = 'reaction_wheel_rpm'").collect()
    }
    for i in (0, 10, 40):
        if i % 11 != 5:
            assert rows[i] == pytest.approx(
                round(5000 + 200 * math.cos(i / 20), 2)
            )


def test_melt_handles_mixed_inferred_types(spark, tmp_path):
    """An all-integer channel infers INT while a decimal channel infers
    DOUBLE; stack() requires homogeneous branches, so the melt must cast
    — a mixed-type telemetry file previously failed to plan."""
    from mission_data_pipeline_spark.sources import read_csv_telemetry

    p = tmp_path / "mixed.csv"
    p.write_text(
        "time,apid,seq_count,int_chan,float_chan\n"
        "0.0,291,0,5,1.25\n"
        "1.0,291,1,7,2.50\n"
    )
    out = read_csv_telemetry(spark, str(p))
    got = {(r["name"], r["seq_count"]): r["raw_value"] for r in out.collect()}
    assert got[("int_chan", 0)] == 5.0 and got[("float_chan", 1)] == 2.5
