"""Partitioning-invariance sweep harness (VERDICT r07 item 1).

The engine claims cross-partition determinism: quantized-BIGINT /
DECIMAL accumulators, order-pinned windows, deterministic tie breaks.
``scripts/check_correctness.py --perturb`` machine-sweeps the claim by
re-running every query under an adversarial layout (awkward-prime
shuffle partitions + every input view repartitioned) and exact-diffing
against the default-layout result.

These tests pin the harness itself:
- a SEEDED raw-double cross-partition sum (the defect class the sweep
  exists for) must be CAUGHT — it passes a single-layout check by
  accident of evaluation order and diverges under the perturbed layout;
- the determinism-engineered equivalent (DECIMAL accumulator) must be
  bit-identical under the same perturbation;
- a representative slice of real declared queries must be invariant;
- the perturbation must restore session conf and the view knob.
"""

import sys

import pytest

sys.path.insert(0, "scripts")
sys.path.insert(0, ".")

from check_correctness import compare, run_perturbed  # noqa: E402

from mission_data_pipeline_spark.plans import queries as qmod  # noqa: E402

SF = "/root/testdata/sf0.001"


def _run_default(spark, fn):
    # Mirror the harness's default leg: unperturbed views, session conf.
    qmod.set_input_repartition(None)
    qmod.register_views(spark, SF, force=True)
    return fn(spark, SF).toPandas()


def _seeded_float_sum(spark, sf_dir):
    """The deliberate defect: a raw-double sum over mixed magnitudes.

    1e17 markers interleaved with ~1e3-magnitude values make the float
    sum depend on which partial-sum a small value lands in — exactly
    what a correct operator avoids via DECIMAL/quantized accumulators.
    """
    qmod.register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT SUM(CASE WHEN l_orderkey % 7 = 0 THEN 1e17
                        ELSE l_extendedprice * 1.0000001 END) AS s
        FROM lineitem
        """
    )


def _decimal_sum(spark, sf_dir):
    qmod.register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT CAST(CAST(SUM(CASE WHEN l_orderkey % 7 = 0
                                  THEN CAST(1e17 AS DECIMAL(30,6))
                                  ELSE CAST(l_extendedprice * 1.0000001
                                            AS DECIMAL(30,6)) END)
                    AS STRING) AS DOUBLE) AS s
        FROM lineitem
        """
    )


def test_seeded_float_sum_is_caught(spark):
    base = _run_default(spark, _seeded_float_sum)
    pert = run_perturbed(spark, _seeded_float_sum, SF)
    problems = compare("seeded_float_sum", pert, base)
    assert problems, (
        "the seeded raw-double cross-partition sum must diverge under "
        f"the adversarial layout; got equal results {base.iloc[0]['s']!r}"
    )
    assert any("values differ" in p for p in problems)


def test_decimal_engineered_sum_is_invariant(spark):
    base = _run_default(spark, _decimal_sum)
    pert = run_perturbed(spark, _decimal_sum, SF)
    assert compare("decimal_sum", pert, base) == []


@pytest.mark.parametrize(
    "name",
    [
        "q1_pricing_summary",  # DECIMAL-exact money sums
        "agg_salted_avg",  # two-stage salted aggregate
        "w_running_sum",  # ordered window over partitioned series
        "x1_distinct_dedup",  # hash-groupBy dedup
        "x2_substring_dedup",  # round-8 gram-keyed span surgery
    ],
)
def test_declared_queries_layout_invariant(spark, name):
    from __spark_entry__ import queries

    fn = queries()[name]
    base = _run_default(spark, fn)
    pert = run_perturbed(spark, fn, SF)
    assert compare(name, pert, base) == [], name


def test_run_perturbed_restores_session_state(spark):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    run_perturbed(spark, _decimal_sum, SF, shuffle_partitions=5)
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev
    assert qmod._INPUT_REPARTITION is None
