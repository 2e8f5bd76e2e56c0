"""CLI tests (reference CLI surface, R5)."""

import json

from click.testing import CliRunner

from mission_data_pipeline_spark.cli import cli


def test_version():
    r = CliRunner().invoke(cli, ["version"])
    assert r.exit_code == 0
    assert "mission_data_pipeline_spark" in r.output


def test_stages_lists_builtins():
    r = CliRunner().invoke(cli, ["stages"])
    assert r.exit_code == 0
    for name in ("binary_packets", "csv_telemetry", "decom", "calibration",
                 "apid_filter", "parquet", "csv", "hdf5"):
        assert name in r.output


def test_inspect(spark, hk_bin):
    # reuse the session-scoped spark (getOrCreate returns it)
    r = CliRunner().invoke(
        cli, ["inspect", hk_bin, "--max-packets", "5", "--master", "local[4]"]
    )
    assert r.exit_code == 0, r.output
    assert "5 packet(s) shown" in r.output
    assert "0x0100" in r.output


def test_run_end_to_end(spark, hk_bin, tmp_path):
    ex_cfg = tmp_path / "ex.json"
    ex_cfg.write_text(json.dumps({"path": hk_bin, "sec_hdr_length": 4}))
    decom_cfg = tmp_path / "decom.json"
    decom_cfg.write_text(
        json.dumps(
            {
                "parameters": [
                    {"name": "obc_temp_dn", "apid": 256, "byte_offset": 0,
                     "bit_length": 16},
                ]
            }
        )
    )
    cal_cfg = tmp_path / "cal.json"
    cal_cfg.write_text(
        json.dumps(
            {
                "calibrations": [
                    {"parameter": "obc_temp_dn", "method": "polynomial",
                     "coefficients": [-55.0, 0.04394531], "unit": "degC"},
                ]
            }
        )
    )
    ld_cfg = tmp_path / "ld.json"
    out_dir = tmp_path / "out"
    ld_cfg.write_text(json.dumps({"output_dir": str(out_dir)}))

    r = CliRunner().invoke(
        cli,
        [
            "run",
            "--extractor", f"binary_packets={ex_cfg}",
            "--transformer", f"decom={decom_cfg}",
            "--transformer", f"calibration={cal_cfg}",
            "--loader", f"parquet={ld_cfg}",
            "--master", "local[4]",
        ],
    )
    assert r.exit_code == 0, r.output
    assert "SUCCESS" in r.output
    back = spark.read.parquet(str(out_dir))
    assert back.count() == 200
    assert back.filter("unit = 'degC'").count() == 200


def test_run_unknown_stage_is_clean_error():
    r = CliRunner().invoke(cli, ["run", "--extractor", "nope=x.json"])
    assert r.exit_code != 0
    assert "registered" in r.output


def test_query_list_and_filters():
    r = CliRunner().invoke(cli, ["query", "list"])
    assert r.exit_code == 0, r.output
    assert "q1_pricing_summary" in r.output
    assert "x2_substring_dedup" in r.output
    # every declared query appears, count line matches the registry
    from mission_data_pipeline_spark.plans.queries import QUERIES

    assert f"{len(QUERIES)} queries" in r.output
    r = CliRunner().invoke(cli, ["query", "list", "--tag", "X2"])
    assert r.exit_code == 0
    assert "x2_minhash_bands" in r.output and "q1_pricing_summary" not in r.output
    r = CliRunner().invoke(cli, ["query", "list", "--grep", "pagerank"])
    assert r.exit_code == 0 and "g_pagerank" in r.output


def test_query_run_by_name(spark):
    r = CliRunner().invoke(
        cli,
        ["query", "run", "d8_top_n_preview",
         "--sf", "/root/testdata/sf0.001", "--master", "local[4]"],
    )
    assert r.exit_code == 0, r.output
    assert "rows" in r.output or "+--" in r.output  # show() table rendered


def test_query_run_explain(spark):
    r = CliRunner().invoke(
        cli,
        ["query", "run", "q1_pricing_summary", "--explain",
         "--sf", "/root/testdata/sf0.001", "--master", "local[4]"],
    )
    assert r.exit_code == 0, r.output
    # Physical-plan markers reach the user: the point of --explain is
    # auditing pushdown/codegen, so assert the sections exist
    assert "Physical Plan" in r.output
    assert "HashAggregate" in r.output


def test_query_run_oracle_and_unknown():
    r = CliRunner().invoke(cli, ["query", "run", "q1_pricing_summary", "--oracle"])
    assert r.exit_code == 0 and "SELECT" in r.output.upper()
    r = CliRunner().invoke(cli, ["query", "run", "q1_pricing_sumary"])
    assert r.exit_code != 0
    assert "did you mean" in r.output and "q1_pricing_summary" in r.output
