"""The curation capstone (curation_shard_build_e2e) beyond the oracle:
the emitted artifacts themselves — JSONL shard files, partition layout,
manifest — must be consistent with the accounting the query returns,
and the sampled-oracle harness must present identical document subsets
to both engines.
"""

from __future__ import annotations

import glob
import json
import os

import duckdb

from mission_data_pipeline_spark.plans import queries as qmod
from mission_data_pipeline_spark.plans.queries import QUERIES, register_views


def test_shard_build_artifacts_match_accounting(spark, sf0001):
    acct = (
        QUERIES["curation_shard_build_e2e"].spark(spark, sf0001).collect()
    )
    assert acct, "capstone produced no packs"
    base = os.path.join(qmod._SCRATCH_ROOT, "shard_build_e2e")

    # Manifest exists and its totals equal the accounting's.
    with open(os.path.join(base, "manifest.json")) as f:
        manifest = json.load(f)
    assert manifest["format"] == "jsonl-shards/v1"
    assert manifest["n_docs"] == sum(r["n_docs"] for r in acct)
    assert manifest["total_tokens"] == sum(r["total_tokens"] for r in acct)
    langs = {r["lang"] for r in acct}
    assert set(manifest["languages"]) == langs
    for lang in langs:
        rows = [r for r in acct if r["lang"] == lang]
        m = manifest["languages"][lang]
        assert m["n_packs"] == len(rows)
        assert m["n_docs"] == sum(r["n_docs"] for r in rows)
        assert m["total_tokens"] == sum(r["total_tokens"] for r in rows)

    # Physical layout: one partition directory per (lang, pack_id) in
    # the accounting, each holding at least one JSON part file whose
    # line count equals the pack's n_docs.
    for r in acct:
        part_dir = os.path.join(
            base, "shards", f"lang={r['lang']}", f"pack_id={r['pack_id']}"
        )
        parts = glob.glob(os.path.join(part_dir, "*.json")) + glob.glob(
            os.path.join(part_dir, "part-*")
        )
        parts = [p for p in set(parts) if not p.endswith(".crc")]
        assert parts, f"no shard files under {part_dir}"
        n_lines = 0
        for p in parts:
            with open(p) as f:
                n_lines += sum(1 for line in f if line.strip())
        assert n_lines == r["n_docs"]


def test_oracle_sample_subsets_identical(spark, sf0001):
    """set_input_sample presents the SAME documents subset to Spark and
    DuckDB (membership is a pure seeded-hash function of doc_id), for
    EVERY residue class — and the residue classes partition the table
    (disjoint, union = all docs), so the round gate's per-round residue
    rotation (scripts/round_gate.sh, ADVICE r11) covers disjoint subsets
    that jointly exhaust the corpus."""
    by_residue: dict[int, list] = {}
    try:
        for residue in range(3):
            qmod.set_input_sample(3, residue=residue)
            register_views(spark, sf0001, force=True)
            spark_ids = sorted(
                r["doc_id"]
                for r in spark.table("documents").select("doc_id").collect()
            )
            pred = qmod.input_sample_predicate_duckdb()
            duck_ids = [
                r[0]
                for r in duckdb.sql(
                    f"SELECT doc_id FROM '{sf0001}/documents.parquet' "
                    f"WHERE {pred} ORDER BY doc_id"
                ).fetchall()
            ]
            assert spark_ids == duck_ids, f"residue {residue} diverged"
            by_residue[residue] = spark_ids
    finally:
        qmod.set_input_sample(None)
        register_views(spark, sf0001, force=True)
    total = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf0001}/documents.parquet'"
    ).fetchone()[0]
    # each residue is a real subset, roughly the requested 1/3
    for residue, ids in by_residue.items():
        assert 0 < len(ids) < total
        assert abs(len(ids) / total - 1 / 3) < 0.15
    # disjoint and exhaustive across residues
    all_ids = [i for ids in by_residue.values() for i in ids]
    assert len(all_ids) == len(set(all_ids)) == total


def test_set_input_sample_validates_residue():
    import pytest

    with pytest.raises(ValueError):
        qmod.set_input_sample(10, residue=10)
    with pytest.raises(ValueError):
        qmod.set_input_sample(10, residue=-1)
    assert qmod.input_sample_predicate_duckdb() is None  # knob untouched


def test_queries_facade_aliases_registry_dict():
    """The facade's QUERIES must BE query_core.QUERIES (ADVICE r11):
    a shallow-copy rebind would make any post-import registration via
    the re-exported _q land in query_core's dict and be invisible to
    every consumer of the facade."""
    from mission_data_pipeline_spark.plans import query_core

    assert qmod.QUERIES is query_core.QUERIES
