"""Plan-shape linter sweep: every declared query's physical plan is
checked for anti-pattern nodes (plans/lint.py), making plan QUALITY
regression-proof the way the oracle sweep makes answers
regression-proof. A refactor that silently drops a broadcast, breaks
pushdown, or introduces a global window now fails the suite.

The allowlist below is the complete, justified set of exceptions; a
stale entry (allowed but no longer triggered) also fails, so the list
can only shrink truthfully.
"""

from __future__ import annotations

import pytest

from mission_data_pipeline_spark.plans.lint import lint_plan

# Per-query allowed rule ids, each with a WHY. The dominant pattern is
# `nested-loop-join`: a Cross BNLJ whose broadcast side is a ONE-ROW
# global aggregate (corpus totals, trained thresholds) or a fixture-
# bounded probe slice — O(|corpus| x 1) work, the correct way to attach
# a scalar statistic to every row without a shuffle.
ALLOW: dict[str, set[str]] = {
    # one-row corpus totals broadcast onto term/doc tables
    "x4_unigram_logprob": {"nested-loop-join"},
    "x4_heldout_backoff_logprob": {"nested-loop-join"},
    "x4_tfidf_sparse": {"nested-loop-join"},
    "x4_bm25_relevance": {"nested-loop-join"},
    "x4_lang_id_confusion": {"nested-loop-join"},
    "x4_linear_probe_fit": {"nested-loop-join"},
    "s_jsonl_corrupt_quarantine": {"nested-loop-join"},
    # one-row corpus-total broadcast onto the vocabulary-sized estimate
    # table (the CMS additive error bound needs N)
    "agg_cms_heavy_hitters": {"nested-loop-join"},
    # one-row quantile/threshold/normalizer broadcasts for sampling gates
    "curation_quality_tiers": {"nested-loop-join"},
    "curation_mixture_sample": {"nested-loop-join"},
    "curation_temperature_sample": {"nested-loop-join"},
    # one-row (totr, tott) corpus-total broadcast onto the O(buckets)
    # DSIR model table — scalar-statistic attach, corpus never crosses
    "curation_dsir_select": {"nested-loop-join"},
    # deliberate small cross join (the declared CROSS JOIN demo; 5x5 dims)
    "join_cross_small": {"nested-loop-join"},
    # 10-row literal threshold grid broadcast onto per-doc scores —
    # O(|corpus| x 10) map-side work, the correct sweep shape
    "curation_filter_threshold_sweep": {"nested-loop-join"},
    # bounded probe-side similarity: the broadcast side is a fixed id
    # slice (LINEAR in corpus, see VERIFY notes), never corpus x corpus
    "x3_cosine_topk_bruteforce": {"nested-loop-join"},
    # same bounded probe-side shape, PLUS the one-row corpus-total
    # broadcast inside the embed_text_hashed idf stage
    "x3_text_embed_ann": {"nested-loop-join"},
    "x3_knn_label_vote": {"nested-loop-join"},
    "x3_hard_negative_mining": {"nested-loop-join"},
    "x3_matryoshka_recall": {"nested-loop-join"},
    "x2_embedding_near_dup": {"nested-loop-join"},
    "x2_minhash_bands": {"nested-loop-join"},
    "x2_simhash_fingerprint": {"nested-loop-join"},
    "x2_simhash_near_pairs": {"nested-loop-join"},
    # three ONE-ROW accounting aggregates (candidate count, drop count,
    # survivor stats) cross-joined into the single output row — the
    # corpus side never crosses anything
    "x2_lsh_bucket_cap": {"nested-loop-join"},
    "x2_lsh_bucket_cap_reps": {"nested-loop-join"},
}


def test_query_library_plan_shapes(spark, sf0001):
    """Sweep ALL declared queries; fail on any non-allowlisted
    anti-pattern node, and on any allowlist entry that no longer fires
    (so the exception list cannot rot)."""
    from mission_data_pipeline_spark.plans.queries import QUERIES

    failures: dict[str, list[str]] = {}
    fired: dict[str, set[str]] = {}
    for name, q in QUERIES.items():
        df = q.spark(spark, sf0001)
        plan = df._jdf.queryExecution().executedPlan().toString()
        all_hits = lint_plan(plan)
        allowed = ALLOW.get(name, set())
        fired[name] = {h.split(":", 1)[0] for h in all_hits} & allowed
        bad = [h for h in all_hits if h.split(":", 1)[0] not in allowed]
        if bad:
            failures[name] = bad

    assert not failures, "plan-shape violations:\n" + "\n".join(
        f"  {n}:\n    " + "\n    ".join(v) for n, v in sorted(failures.items())
    )
    stale = {
        n: sorted(ALLOW[n] - fired.get(n, set()))
        for n in ALLOW
        if ALLOW[n] - fired.get(n, set())
    }
    assert not stale, f"stale allowlist entries (rule no longer fires): {stale}"


# ---------------------------------------------------------------------------
# Seeded regressions: prove each rule actually catches its anti-pattern.
# ---------------------------------------------------------------------------


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_lint_catches_cartesian_product(spark):
    a, b = spark.range(10), spark.range(10)
    df = a.join(b.hint("shuffle_replicate_nl"))  # forces CartesianProduct
    hits = lint_plan(_plan(df))
    assert any(h.startswith("cartesian-product") for h in hits), hits


def test_lint_catches_row_python_udf(spark):
    from pyspark.sql.functions import col, udf

    prev = spark.conf.get("spark.sql.execution.pythonUDF.arrow.enabled", "false")
    spark.conf.set("spark.sql.execution.pythonUDF.arrow.enabled", "false")
    try:
        inc = udf(lambda x: x + 1, "long")
        hits = lint_plan(_plan(spark.range(5).select(inc(col("id")))))
    finally:
        spark.conf.set("spark.sql.execution.pythonUDF.arrow.enabled", prev)
    assert any(h.startswith("row-python-udf") for h in hits), hits


def test_lint_catches_global_window(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.range(10).withColumn(
        "rn", F.row_number().over(Window.orderBy("id"))
    )
    hits = lint_plan(_plan(df))
    assert any(h.startswith("global-window") for h in hits), hits


def test_lint_catches_single_partition_funnel(spark):
    from pyspark.sql import functions as F

    df = spark.range(100).repartition(1).filter(F.col("id") > 3)
    hits = lint_plan(_plan(df))
    assert any(h.startswith("single-partition-exchange") for h in hits), hits
    # ...but a global aggregate's one-row exchange is NOT flagged
    ok = spark.range(100).groupBy().sum("id")
    assert not lint_plan(_plan(ok))


def test_lint_catches_missed_pushdown(spark, sf0001):
    from pyspark.sql import functions as F

    # A real healthy plan is clean: the predicate reaches the scan.
    df = spark.read.parquet(f"{sf0001}/orders.parquet").filter(
        F.col("o_custkey") > 100
    )
    healthy = _plan(df)
    assert "PushedFilters: [IsNotNull(o_custkey)" in healthy  # sanity
    assert not lint_plan(healthy)
    # Seed the regression by blanking the scan's PushedFilters in that
    # same plan text (Spark prints PushedFilters even when the runtime
    # pushdown conf is off, so the broken shape can't be produced live;
    # the rule is a plan-text analyzer, so the seeded text is the exact
    # artifact it must catch).
    import re

    broken = re.sub(r"PushedFilters: \[[^\]]*\]", "PushedFilters: []", healthy)
    hits = lint_plan(broken)
    assert any(h.startswith("missed-pushdown") for h in hits), hits


def test_lint_catches_nested_loop_join(spark):
    big, tiny = spark.range(1000), spark.range(3)
    df = big.crossJoin(tiny)
    hits = lint_plan(_plan(df))
    assert any(h.startswith("nested-loop-join") for h in hits), hits
