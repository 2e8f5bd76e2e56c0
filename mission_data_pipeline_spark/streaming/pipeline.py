"""Streaming pipeline runner.

W1: the reference's generator micro-batching (``binary.py:115-123``)
restated as Structured Streaming + ``foreachBatch``: the SAME
Transformer stages and Loader used in batch mode run against every
micro-batch, with the same hooks/metrics accounting. Exactly-once is
inherited from the sink's idempotence + checkpointing (file sources
track progress in the checkpoint dir).
"""

from __future__ import annotations

import logging
import time
from typing import Any

from pyspark.sql import DataFrame

from mission_data_pipeline_spark.core.base import (
    Loader,
    TelemetryBatch,
    Transformer,
)
from mission_data_pipeline_spark.observability.hooks import HookManager
from mission_data_pipeline_spark.observability.metrics import PipelineMetrics

log = logging.getLogger("mission_data_pipeline_spark.streaming")


class StreamingPipeline:
    """Apply Transformer stages + a Loader to each streaming micro-batch."""

    def __init__(
        self,
        *,
        transformers: list[Transformer] | None = None,
        loader: Loader | None = None,
        hooks: HookManager | None = None,
        metrics: PipelineMetrics | None = None,
        stream_is_params: bool = True,
    ) -> None:
        self.transformers = list(transformers or [])
        self.loader = loader
        self.hooks = hooks or HookManager()
        self.metrics = metrics or PipelineMetrics()
        self.stream_is_params = stream_is_params

    def _process_batch(self, df: DataFrame, epoch_id: int) -> None:
        batch = (
            TelemetryBatch(params=df, metadata={"epoch": epoch_id})
            if self.stream_is_params
            else TelemetryBatch(packets=df, metadata={"epoch": epoch_id})
        )
        n = df.count()
        self.metrics.record_batch(n)
        self.hooks.fire("batch.extracted", batch=epoch_id, records=n)
        for tr in self.transformers:
            t0 = time.perf_counter()
            batch = tr.transform(batch)
            self.metrics.record_stage(
                type(tr).__name__, elapsed_s=time.perf_counter() - t0, records_in=n
            )
        self.hooks.fire("batch.transformed", batch=epoch_id, records=n)
        if self.loader is not None:
            t0 = time.perf_counter()
            written = self.loader.load(batch)
            self.metrics.record_stage(
                type(self.loader).__name__,
                elapsed_s=time.perf_counter() - t0,
                records_in=n,
                records_out=written,
            )
            self.hooks.fire("batch.loaded", batch=epoch_id, records=written)

    def start(
        self,
        stream: DataFrame,
        *,
        checkpoint_dir: str,
        available_now: bool = False,
        trigger_interval: str | None = None,
        query_name: str = "mdps-stream",
    ) -> Any:
        """Start the query; returns the StreamingQuery handle.

        ``available_now=True`` drains everything currently available and
        stops — the batch-parity mode used by tests and backfills.
        """
        writer = (
            stream.writeStream.foreachBatch(self._process_batch)
            .queryName(query_name)
            .option("checkpointLocation", checkpoint_dir)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        elif trigger_interval:
            writer = writer.trigger(processingTime=trigger_interval)
        self.hooks.fire("pipeline.start", pipeline=query_name)
        return writer.start()
