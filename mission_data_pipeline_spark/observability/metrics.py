"""Pipeline metrics accumulator.

Parity: reference ``src/mdp/observability/metrics.py:15-120`` — running
batch/packet counters (A1, ``:40-58``), per-stage sums (A2, ``:60-77``),
derived averages with zero-division → 0.0 (A3, ``:26-37``), nested
rounded snapshot dict (A5, ``:101-120``). Thread-safe via a lock, as in
the reference (``:45-47``); on Spark the driver-side orchestration loop
is the only writer, but foreachBatch streaming callbacks may run on a
separate thread, so the lock stays.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field


@dataclass
class StageMetric:
    invocations: int = 0
    records_in: int = 0
    records_out: int = 0
    errors: int = 0
    total_elapsed_s: float = 0.0

    @property
    def avg_elapsed_s(self) -> float:
        return self.total_elapsed_s / self.invocations if self.invocations else 0.0

    @property
    def throughput_rps(self) -> float:
        return (
            self.records_out / self.total_elapsed_s if self.total_elapsed_s else 0.0
        )


@dataclass
class PipelineMetrics:
    batches_processed: int = 0
    total_packets: int = 0
    _stages: dict[str, StageMetric] = field(default_factory=dict)
    _lock: threading.Lock = field(default_factory=threading.Lock, repr=False)

    def record_batch(self, n_packets: int) -> None:
        with self._lock:
            self.batches_processed += 1
            self.total_packets += n_packets

    def record_stage(
        self,
        stage_name: str,
        *,
        elapsed_s: float,
        records_in: int = 0,
        records_out: int = 0,
        error: bool = False,
    ) -> None:
        with self._lock:
            m = self._stages.setdefault(stage_name, StageMetric())
            m.invocations += 1
            m.records_in += max(records_in, 0)
            m.records_out += max(records_out, 0)
            m.errors += 1 if error else 0
            m.total_elapsed_s += elapsed_s

    def stage(self, name: str) -> StageMetric:
        return self._stages.setdefault(name, StageMetric())

    def snapshot(self) -> dict:
        """Serializable nested dict, rounded (reference ``:101-120``)."""
        with self._lock:
            return {
                "batches_processed": self.batches_processed,
                "total_packets": self.total_packets,
                "stages": {
                    name: {
                        "invocations": m.invocations,
                        "records_in": m.records_in,
                        "records_out": m.records_out,
                        "errors": m.errors,
                        "total_elapsed_s": round(m.total_elapsed_s, 6),
                        "avg_elapsed_s": round(m.avg_elapsed_s, 6),
                        "throughput_rps": round(m.throughput_rps, 3),
                    }
                    for name, m in self._stages.items()
                },
            }
