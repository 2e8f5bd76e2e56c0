"""Pipeline orchestration tests (reference ``tests/test_core_pipeline.py``)."""

from collections.abc import Iterator

import pytest
from pyspark.sql import functions as F

from mission_data_pipeline_spark.core import (
    Extractor,
    Loader,
    Pipeline,
    PipelineConfig,
    TelemetryBatch,
    Transformer,
)
from mission_data_pipeline_spark.core.base import StageConfig


class StubExtractor(Extractor):
    def __init__(self, spark, n_batches=3, rows=4):
        super().__init__(StageConfig())
        self._spark = spark
        self._n = n_batches
        self._rows = rows

    def extract(self, spark) -> Iterator[TelemetryBatch]:
        for b in range(self._n):
            df = spark.range(self._rows).select(
                F.lit("p").alias("name"),
                (F.col("id") + b * self._rows).cast("double").alias("raw_value"),
            )
            yield TelemetryBatch(params=df, metadata={"batch": b})


class DoublingTransformer(Transformer):
    def transform(self, batch):
        return TelemetryBatch(
            batch.packets,
            batch.params.withColumn("raw_value", F.col("raw_value") * 2),
            batch.metadata,
        )


class FailingTransformer(Transformer):
    def transform(self, batch):
        raise RuntimeError("boom")


class CollectLoader(Loader):
    def __init__(self):
        super().__init__(StageConfig())
        self.rows = []

    def load(self, batch) -> int:
        got = batch.params.collect()
        self.rows.extend(got)
        return len(got)


def test_basic_run(spark):
    loader = CollectLoader()
    p = Pipeline(
        {"name": "t"},
        extractor=StubExtractor(spark),
        transformers=[DoublingTransformer()],
        loader=loader,
    )
    r = p.run(spark)
    assert r.ok and r.status.value == "success"
    assert r.batches_processed == 3
    assert r.total_packets == 12
    assert len(loader.rows) == 12
    assert sorted(x["raw_value"] for x in loader.rows)[-1] == 22.0  # 11*2


def test_dry_run_skips_loader(spark):
    loader = CollectLoader()
    p = Pipeline(
        {"name": "t", "dry_run": True},
        extractor=StubExtractor(spark),
        loader=loader,
    )
    r = p.run(spark)
    assert r.ok and not loader.rows
    assert any(s.status.value == "skipped" for s in r.stage_results)


def test_max_batches(spark):
    loader = CollectLoader()
    p = Pipeline(
        {"name": "t", "max_batches": 2},
        extractor=StubExtractor(spark, n_batches=5),
        loader=loader,
    )
    r = p.run(spark)
    assert r.batches_processed == 2
    assert len(loader.rows) == 8


def test_stop_on_error_default(spark):
    loader = CollectLoader()
    p = Pipeline(
        {"name": "t"},
        extractor=StubExtractor(spark),
        transformers=[FailingTransformer()],
        loader=loader,
    )
    r = p.run(spark)
    assert not r.ok
    assert r.batches_processed == 1  # stopped on first batch
    assert not loader.rows  # loader never reached
    assert "boom" in r.errors[0]


def test_error_continuation_loads_unchanged(spark):
    # stop_on_error=False: remaining transformers of the batch are
    # skipped, but the (unchanged) batch is still loaded — P2
    loader = CollectLoader()
    p = Pipeline(
        {"name": "t", "stop_on_error": False},
        extractor=StubExtractor(spark),
        transformers=[FailingTransformer(), DoublingTransformer()],
        loader=loader,
    )
    r = p.run(spark)
    assert not r.ok
    assert r.batches_processed == 3
    assert len(loader.rows) == 12
    assert max(x["raw_value"] for x in loader.rows) == 11.0  # NOT doubled


def test_extractor_failure_recorded(spark):
    class BadExtractor(Extractor):
        def __init__(self):
            super().__init__(StageConfig())

        def extract(self, spark):
            yield TelemetryBatch(params=spark.range(1).selectExpr("'p' name"))
            raise OSError("disk gone")

    p = Pipeline({"name": "t"}, extractor=BadExtractor(), loader=CollectLoader())
    r = p.run(spark)
    assert not r.ok
    assert r.batches_processed == 1
    assert "disk gone" in r.errors[0]


def test_summary_text(spark):
    p = Pipeline(
        {"name": "demo"},
        extractor=StubExtractor(spark, n_batches=1),
        loader=CollectLoader(),
    )
    s = p.run(spark).summary()
    assert "Pipeline 'demo': SUCCESS" in s
    assert "CollectLoader" in s


def test_hooks_fired(spark):
    p = Pipeline(
        {"name": "t"},
        extractor=StubExtractor(spark, n_batches=2),
        loader=CollectLoader(),
    )
    seen = []
    p.hooks.on("pipeline.start")(lambda **kw: seen.append("start"))
    p.hooks.on("batch.loaded")(lambda **kw: seen.append("loaded"))
    p.hooks.on("pipeline.complete")(lambda **kw: seen.append("complete"))
    p.run(spark)
    assert seen == ["start", "loaded", "loaded", "complete"]


def test_metrics_recorded(spark):
    p = Pipeline(
        {"name": "t"},
        extractor=StubExtractor(spark, n_batches=2),
        transformers=[DoublingTransformer()],
        loader=CollectLoader(),
    )
    p.run(spark)
    snap = p.metrics.snapshot()
    assert snap["batches_processed"] == 2
    assert snap["total_packets"] == 8
    assert snap["stages"]["DoublingTransformer"]["invocations"] == 2
    assert snap["stages"]["CollectLoader"]["records_out"] == 8


def test_pipeline_config_validation():
    with pytest.raises(Exception):
        PipelineConfig(name="x", nope=True)
