"""Observability tests (reference ``tests/test_observability.py``)."""

import json
import logging

import pytest

from mission_data_pipeline_spark.observability import (
    HookManager,
    PipelineMetrics,
    configure_logging,
)
from mission_data_pipeline_spark.observability.hooks import EventHook


def test_metrics_counters_and_derived():
    m = PipelineMetrics()
    m.record_batch(100)
    m.record_batch(50)
    m.record_stage("decom", elapsed_s=2.0, records_in=150, records_out=300)
    m.record_stage("decom", elapsed_s=2.0, records_in=150, records_out=300)
    snap = m.snapshot()
    assert snap["batches_processed"] == 2
    assert snap["total_packets"] == 150
    d = snap["stages"]["decom"]
    assert d["invocations"] == 2
    assert d["avg_elapsed_s"] == 2.0
    assert d["throughput_rps"] == 150.0  # 600 / 4s


def test_metrics_zero_division():
    m = PipelineMetrics()
    s = m.stage("empty")
    assert s.avg_elapsed_s == 0.0
    assert s.throughput_rps == 0.0


def test_metrics_error_count():
    m = PipelineMetrics()
    m.record_stage("cal", elapsed_s=0.1, error=True)
    assert m.snapshot()["stages"]["cal"]["errors"] == 1


def test_hook_fire_and_unregister():
    h = EventHook("x")
    seen = []
    f = h.register(lambda **kw: seen.append(kw["v"]))
    h.fire(v=1)
    h.unregister(f)
    h.fire(v=2)
    assert seen == [1]


def test_hook_swallows_handler_errors():
    h = EventHook("x")
    seen = []

    def bad(**kw):
        raise RuntimeError("handler broke")

    h.register(bad)
    h.register(lambda **kw: seen.append(True))
    h.fire()  # must not raise
    assert seen == [True]


def test_manager_builtins():
    hm = HookManager()
    assert "pipeline.start" in hm.events()
    assert "stage.error" in hm.events()
    seen = []
    hm.on("batch.loaded")(lambda **kw: seen.append(kw))
    hm.fire("batch.loaded", records=5)
    assert seen == [{"records": 5}]


def test_logging_fmt_honored(capsys):
    log = configure_logging(level="INFO", fmt="json")
    log.info("hello", extra={"ctx_run": "r1"})
    err = capsys.readouterr().err.strip().splitlines()[-1]
    payload = json.loads(err)
    assert payload["event"] == "hello"
    assert payload["run"] == "r1"
    # console mode: not JSON
    log = configure_logging(level="INFO", fmt="console")
    log.info("world")
    err = capsys.readouterr().err
    assert "world" in err
    with pytest.raises(ValueError):
        configure_logging(fmt="yaml")
    logging.getLogger("mission_data_pipeline_spark").handlers.clear()
