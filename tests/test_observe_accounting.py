"""R3 observe-mode accounting: exact per-stage counts from ONE job/batch.

The scale contract (VERDICT r05 #1): with ``count_method="observe"``
(the default), per-stage ``records_in/out`` come from
``df.observe(count(*))`` harvested after the batch's single action —
the legacy ``count_method="count"`` path re-executes the plan once per
stage. Reference semantics matched: ``src/mdp/observability/metrics.py
:60-77`` (record_stage fed with real counts).
"""

from collections.abc import Iterator

from pyspark.sql import functions as F

from mission_data_pipeline_spark.core import (
    Extractor,
    Loader,
    Pipeline,
    TelemetryBatch,
    Transformer,
)
from mission_data_pipeline_spark.core.base import StageConfig


class RangeExtractor(Extractor):
    def __init__(self, n_batches=2, rows=10):
        super().__init__(StageConfig())
        self._n, self._rows = n_batches, rows

    def extract(self, spark) -> Iterator[TelemetryBatch]:
        for b in range(self._n):
            df = spark.range(self._rows).select(
                F.lit("p").alias("name"),
                (F.col("id") + b * self._rows).cast("double").alias("raw_value"),
            )
            yield TelemetryBatch(params=df, metadata={"batch": b})


class HalvingFilter(Transformer):
    def transform(self, batch):
        return TelemetryBatch(
            batch.packets,
            batch.params.filter(F.col("raw_value") % 2 == 0),
            batch.metadata,
        )


class DoublingTransformer(Transformer):
    def transform(self, batch):
        return TelemetryBatch(
            batch.packets,
            batch.params.withColumn("raw_value", F.col("raw_value") * 2),
            batch.metadata,
        )


class NoopLoader(Loader):
    """Single write action, no driver materialization, no row count."""

    def __init__(self):
        super().__init__(StageConfig())

    def load(self, batch):
        batch.params.write.format("noop").mode("overwrite").save()
        return None  # rows-written unknown → backfilled from observation


def test_observe_mode_counts_and_single_job(spark):
    p = Pipeline(
        {"name": "obsjob"},
        extractor=RangeExtractor(n_batches=2, rows=10),
        transformers=[HalvingFilter(), DoublingTransformer()],
        loader=NoopLoader(),
    )
    r = p.run(spark)
    assert r.ok

    # exact per-stage accounting, harvested from CollectMetrics
    per_batch = len(r.stage_results) // 2
    for b in range(2):
        halv, doub, load = r.stage_results[b * per_batch : (b + 1) * per_batch]
        assert (halv.records_in, halv.records_out) == (10, 5)
        assert (doub.records_in, doub.records_out) == (5, 5)
        assert (load.records_in, load.records_out) == (5, 5)
    assert r.total_packets == 20
    snap = p.metrics.snapshot()
    assert snap["total_packets"] == 20
    assert snap["stages"]["HalvingFilter"]["records_in"] == 20
    assert snap["stages"]["HalvingFilter"]["records_out"] == 10
    assert snap["stages"]["NoopLoader"]["records_out"] == 10

    # THE scale assertion: one Spark job per batch (observe mode never
    # forces extra actions; legacy count mode would run 4 jobs/batch here)
    tracker = spark.sparkContext.statusTracker()
    for b in (1, 2):
        jobs = tracker.getJobIdsForGroup(f"mdps:obsjob:batch{b}")
        assert len(jobs) == 1, f"batch {b}: expected exactly 1 job, got {jobs}"


def test_count_mode_still_exact_but_multi_job(spark):
    p = Pipeline(
        {"name": "cntjob", "count_method": "count"},
        extractor=RangeExtractor(n_batches=1, rows=10),
        transformers=[HalvingFilter()],
        loader=NoopLoader(),
    )
    r = p.run(spark)
    assert r.ok
    halv = next(s for s in r.stage_results if s.stage_name == "HalvingFilter")
    assert (halv.records_in, halv.records_out) == (10, 5)
    jobs = spark.sparkContext.statusTracker().getJobIdsForGroup("mdps:cntjob:batch1")
    assert len(jobs) > 1  # the legacy path pays one action per stage


class _TwoSidedExtractor(Extractor):
    def __init__(self):
        super().__init__(StageConfig())

    def extract(self, s) -> Iterator[TelemetryBatch]:
        yield TelemetryBatch(
            packets=s.range(7).selectExpr("id as apid"),
            params=s.range(3).selectExpr("'p' as name"),
        )


def test_observe_dead_branch_default_backfills_count(spark):
    """Default policy: a side the action never executes is backfilled
    with a bounded count() — accounting never silently reads -1 after
    an action ran."""
    p = Pipeline(
        {"name": "deadfill", "observe_timeout_s": 0.3},
        extractor=_TwoSidedExtractor(),
        loader=NoopLoader(),  # writes params only; packets side never runs
    )
    r = p.run(spark)
    assert r.ok
    assert r.total_packets == 10  # packets(7) + params(3), exact
    load = next(s for s in r.stage_results if s.stage_name == "NoopLoader")
    assert load.records_in == 10


def test_observe_dead_branch_unknown_reads_minus_one(spark):
    """observe_dead_branch='unknown': the dead side stays -1 (no extra
    jobs), not a hang, and not a silent 0."""
    p = Pipeline(
        {
            "name": "dead",
            "observe_timeout_s": 0.3,
            "observe_dead_branch": "unknown",
        },
        extractor=_TwoSidedExtractor(),
        loader=NoopLoader(),
    )
    r = p.run(spark)
    assert r.ok
    # the packets observation is unresolvable → the group reads unknown
    assert r.total_packets == 0
    load = next(s for s in r.stage_results if s.stage_name == "NoopLoader")
    assert load.records_in == -1


def test_observe_counts_off(spark):
    p = Pipeline(
        {"name": "off", "count_records": False},
        extractor=RangeExtractor(n_batches=1, rows=4),
        loader=NoopLoader(),
    )
    r = p.run(spark)
    assert r.ok
    assert r.total_packets == 0
    jobs = spark.sparkContext.statusTracker().getJobIdsForGroup("mdps:off:batch1")
    assert len(jobs) == 1
