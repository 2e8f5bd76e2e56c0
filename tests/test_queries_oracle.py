"""Spot-check declared queries against DuckDB at sf0.001 (fast subset).

The full declared-query suite runs via ``scripts/check_correctness.py`` at
sf0.01 (the driver's gate); this keeps a representative sample inside
the pytest loop so regressions surface immediately.
"""

import duckdb
import pytest

from mission_data_pipeline_spark.plans.queries import QUERIES
from mission_data_pipeline_spark.sources.tables import TABLES

import sys

sys.path.insert(0, ".")
from scripts.check_correctness import compare  # noqa: E402

SAMPLE = [
    "q1_pricing_summary",
    "j1_broadcast_dim_join",
    "join_full_outer",
    "d3_pivot_wide",
    "w_lag_delta_gap",
    "w4_sessionization",
    "x6_json_extract_agg",
    "x2_minhash_bands",
    "x3_cosine_topk_bruteforce",
    "x4_quality_score",
    # round-3 exotic execution paths (streaming run, file round-trips,
    # e2e fixtures) — a pytest row protects them between driver rounds
    "w1_streaming_tumbling",
    "s_warc_ingest",
    "etl_binary_decom_calibrate_e2e",
    "x3_ann_recall",
    # round-4: de-vacuified seeded-dedup check + the KMeans-IVF recall
    # bound (its first correctness signal — keep it exercised)
    "x1_dedup_exact_hash",
    "x3_kmeans_ivf_topk",
    # round-4 second batch: the exotic execution paths (custom stateful
    # streaming, on-disk IVF probe, MERGE round-trips, bucketed join,
    # in-engine classifier) — each exercises machinery no other pytest
    # row touches
    "w3_streaming_stateful_cumulative",
    "x3_ivf_disk_index_topk",
    "l_merge_upsert_roundtrip",
    "w_streaming_foreachbatch_upsert",
    "q3_bucketed_colocated",
    "x4_lang_id_confusion",
]


@pytest.fixture(scope="module")
def duck(sf0001):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf0001}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", SAMPLE)
def test_query_matches_oracle(spark, sf0001, duck, name):
    q = QUERIES[name]
    sdf = q.spark(spark, sf0001).toPandas()
    ddf = duck.execute(q.oracle).fetchdf()
    problems = compare(name, sdf, ddf)
    assert not problems, problems


def test_all_queries_have_survey_ids():
    assert all(q.survey_id for q in QUERIES.values())


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 50


def test_parquet_scan_pushes_filters_and_prunes_columns(spark, sf0001):
    """Scale guard: a filtered 2-column projection over lineitem must
    reach the parquet scan as PushedFilters + a pruned ReadSchema — a
    scan that reads all 11 columns for a 2-column query is the shape
    that dies at 100 TB."""
    from mission_data_pipeline_spark.sources.tables import load_table

    df = (
        load_table(spark, sf0001, "lineitem")
        .filter("l_quantity > 45")
        .select("l_orderkey", "l_quantity")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "GreaterThan(l_quantity,45" in plan
    # column pruning: the scan schema carries only the referenced columns
    read_schema = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_extendedprice" not in read_schema and "l_comment" not in read_schema


def test_driver_contract_surface(spark, sf0001):
    """Mirror of the driver's smoke check: entry() runs and yields rows
    with a stable schema; every oracle_sql() key is a queries() key; the
    check-first ordering references only declared queries with no dups."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e

    from mission_data_pipeline_spark.plans.queries import _CHECK_FIRST, QUERIES

    df = e.entry(spark)
    assert len(df.columns) > 0 and df.count() > 0

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) == len(QUERIES)
    assert len(set(_CHECK_FIRST)) == len(_CHECK_FIRST)
    assert all(n in QUERIES for n in _CHECK_FIRST)


def test_every_query_mapped_in_coverage_doc():
    """COVERAGE.md is the judge-facing operator map — every declared
    query must appear in it (a silent str.replace no-op once dropped a
    row; this pins the invariant)."""
    import pathlib

    cov = (
        pathlib.Path(__file__).parent.parent / "COVERAGE.md"
    ).read_text()
    missing = [n for n in QUERIES if f"`{n}`" not in cov]
    assert not missing, f"queries absent from COVERAGE.md: {missing}"


def test_unimax_oracle_matches_engine_under_null_langs(spark, sf0001, tmp_path):
    """ADVICE r10 (medium): the unimax oracle must exclude NULL-lang rows
    from the water-filling — the engine drops unlabeled rows before
    allocation — while still budgeting over ALL rows (docs.count()*4//5).
    The driver fixtures carry no NULL langs, so the old oracle's
    divergence (NULL group water-filled as a language) passed silently;
    this synthesizes NULL langs and replays both sides."""
    import shutil

    import pandas as pd

    d = tmp_path / "sfnull"
    d.mkdir()
    for t in TABLES:
        shutil.copyfile(f"{sf0001}/{t}.parquet", d / f"{t}.parquet")
    docs = pd.read_parquet(d / "documents.parquet")
    docs.loc[docs.doc_id % 7 == 3, "lang"] = None
    assert docs["lang"].isna().sum() > 0
    docs.to_parquet(d / "documents.parquet", index=False)

    q = QUERIES["curation_unimax_sample"]
    sdf = q.spark(spark, str(d)).toPandas()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")
    ddf = con.execute(q.oracle).fetchdf()
    assert compare("curation_unimax_sample", sdf, ddf) == []
    # NULL-lang rows are excluded from the mixture entirely
    assert sdf["lang"].notna().all()
