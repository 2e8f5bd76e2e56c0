"""Pipeline orchestration.

Parity: reference ``src/mdp/core/pipeline.py:69-195`` — semantics P1–P8
(SURVEY §2.8):

- P1 setup/teardown around every stage invocation (``base.py:75-79``);
- P2 transformer failure → batch continues **unchanged**, FAILED
  StageResult recorded; ``stop_on_error=True`` (default) stops the run,
  else the remaining transformers of THIS batch are skipped and the
  partially-transformed batch is still loaded (``pipeline.py:177-195``);
- P3 loader failure → FAILED result, stop if stop_on_error;
- P4 extractor failure → caught by the outer loop, run marked FAILED;
- P5 ``dry_run`` executes transformers but skips the loader (the plan
  is still forced with a count so transform errors surface);
- P6 ``max_batches``; P7 result objects; P8 SUCCESS iff zero errors.

Unlike the reference, hooks actually fire (R2) and per-stage metrics are
actually recorded (R3). Record counting forces a Spark action per stage;
``count_records=False`` turns it off for production runs so the whole
batch executes as one plan at load time.
"""

from __future__ import annotations

import logging
import time
from collections.abc import Iterator

from pydantic import BaseModel
from pyspark.sql import SparkSession

from mission_data_pipeline_spark.core.base import (
    Extractor,
    Loader,
    TelemetryBatch,
    Transformer,
)
from mission_data_pipeline_spark.core.results import (
    PipelineResult,
    StageResult,
    StageStatus,
)
from mission_data_pipeline_spark.observability.hooks import HookManager
from mission_data_pipeline_spark.observability.metrics import PipelineMetrics

log = logging.getLogger("mission_data_pipeline_spark.pipeline")


class PipelineConfig(BaseModel):
    model_config = {"frozen": True, "extra": "forbid"}

    name: str = "pipeline"
    stop_on_error: bool = True
    dry_run: bool = False
    max_batches: int | None = None
    count_records: bool = True


class Pipeline:
    def __init__(
        self,
        config: PipelineConfig | dict | None = None,
        *,
        extractor: Extractor,
        transformers: list[Transformer] | None = None,
        loader: Loader | None = None,
        hooks: HookManager | None = None,
        metrics: PipelineMetrics | None = None,
    ) -> None:
        if config is None:
            config = PipelineConfig()
        elif isinstance(config, dict):
            config = PipelineConfig(**config)
        self.config = config
        self.extractor = extractor
        self.transformers = list(transformers or [])
        self.loader = loader
        self.hooks = hooks or HookManager()
        self.metrics = metrics or PipelineMetrics()

    # -- timed stage wrappers (P1: setup/teardown even on error) --------

    def _timed(self, stage, fn, batch_in: TelemetryBatch | None, records_in: int):
        t0 = time.perf_counter()
        stage.setup()
        try:
            out = fn()
            elapsed = time.perf_counter() - t0
            return out, elapsed, None
        except Exception as exc:  # noqa: BLE001 - stage errors are data
            elapsed = time.perf_counter() - t0
            return None, elapsed, exc
        finally:
            stage.teardown()

    def _count(self, batch: TelemetryBatch) -> int:
        return batch.row_count() if self.config.count_records else -1

    # -- run -------------------------------------------------------------

    def run(self, spark: SparkSession) -> PipelineResult:
        cfg = self.config
        result = PipelineResult(pipeline_name=cfg.name, status=StageStatus.SUCCESS)
        t_start = time.perf_counter()
        self.hooks.fire("pipeline.start", pipeline=cfg.name, config=cfg)
        log.info("pipeline start", extra={"ctx_pipeline": cfg.name})

        try:
            batches: Iterator[TelemetryBatch] = self.extractor.extract(spark)
            for batch in batches:
                n_in = self._count(batch)
                result.batches_processed += 1
                result.total_packets += max(n_in, 0)
                self.metrics.record_batch(max(n_in, 0))
                self.hooks.fire(
                    "batch.extracted", batch=result.batches_processed, records=n_in
                )

                stop = self._run_transformers_and_load(spark, batch, n_in, result)
                if stop:
                    break
                if (
                    cfg.max_batches is not None
                    and result.batches_processed >= cfg.max_batches
                ):
                    break
        except Exception as exc:  # noqa: BLE001 - P4 extractor failure
            msg = f"{type(self.extractor).__name__}: {exc}"
            result.errors.append(msg)
            result.stage_results.append(
                StageResult(
                    stage_name=type(self.extractor).__name__,
                    status=StageStatus.FAILED,
                    error=str(exc),
                )
            )
            self.hooks.fire(
                "stage.error", stage=type(self.extractor).__name__, error=exc
            )

        result.elapsed_s = time.perf_counter() - t_start
        result.status = (
            StageStatus.SUCCESS if not result.errors else StageStatus.FAILED
        )  # P8
        self.hooks.fire("pipeline.complete", result=result)
        log.info(
            "pipeline complete",
            extra={"ctx_status": result.status.value, "ctx_elapsed": result.elapsed_s},
        )
        return result

    def _run_transformers_and_load(
        self,
        spark: SparkSession,
        batch: TelemetryBatch,
        n_in: int,
        result: PipelineResult,
    ) -> bool:
        """Returns True if the run must stop (stop_on_error hit)."""
        cfg = self.config
        current = batch
        for tr in self.transformers:
            tname = type(tr).__name__
            out, elapsed, exc = self._timed(
                tr, lambda t=tr, b=current: t.transform(b), current, n_in
            )
            if exc is None:
                n_out = self._count(out)
                current = out
                result.stage_results.append(
                    StageResult(tname, StageStatus.SUCCESS, elapsed, n_in, n_out)
                )
                self.metrics.record_stage(
                    tname, elapsed_s=elapsed, records_in=n_in, records_out=n_out
                )
                n_in = n_out
            else:
                # P2: batch continues unchanged; remaining transformers of
                # this batch are skipped either way.
                result.stage_results.append(
                    StageResult(
                        tname, StageStatus.FAILED, elapsed, n_in, n_in, str(exc)
                    )
                )
                result.errors.append(f"{tname}: {exc}")
                self.metrics.record_stage(tname, elapsed_s=elapsed, error=True)
                self.hooks.fire("stage.error", stage=tname, error=exc)
                if cfg.stop_on_error:
                    return True
                break
        self.hooks.fire(
            "batch.transformed", batch=result.batches_processed, records=n_in
        )

        if self.loader is None or cfg.dry_run:
            if cfg.dry_run and self.loader is not None:
                # force the plan so transform-time errors still surface
                self._count(current)
                result.stage_results.append(
                    StageResult(type(self.loader).__name__, StageStatus.SKIPPED)
                )
            return False

        lname = type(self.loader).__name__
        out, elapsed, exc = self._timed(
            self.loader, lambda: self.loader.load(current), current, n_in
        )
        if exc is None:
            n_loaded = out if isinstance(out, int) else n_in
            result.stage_results.append(
                StageResult(lname, StageStatus.SUCCESS, elapsed, n_in, n_loaded)
            )
            self.metrics.record_stage(
                lname, elapsed_s=elapsed, records_in=n_in, records_out=n_loaded
            )
            self.hooks.fire(
                "batch.loaded", batch=result.batches_processed, records=n_loaded
            )
        else:  # P3
            result.stage_results.append(
                StageResult(lname, StageStatus.FAILED, elapsed, n_in, 0, str(exc))
            )
            result.errors.append(f"{lname}: {exc}")
            self.metrics.record_stage(lname, elapsed_s=elapsed, error=True)
            self.hooks.fire("stage.error", stage=lname, error=exc)
            if cfg.stop_on_error:
                return True
        return False
