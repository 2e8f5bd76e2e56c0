"""Result accounting objects.

Parity: reference ``src/mdp/core/base.py:28-52`` (StageStatus,
StageResult) and ``src/mdp/core/pipeline.py:35-66`` (PipelineResult,
``summary()`` text).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum
from typing import Any


class StageStatus(str, Enum):
    SUCCESS = "success"
    FAILED = "failed"
    SKIPPED = "skipped"


@dataclass
class StageResult:
    """Outcome of one stage invocation on one batch."""

    stage_name: str
    status: StageStatus
    elapsed_s: float = 0.0
    records_in: int = 0
    records_out: int = 0
    error: str | None = None
    extra: dict[str, Any] = field(default_factory=dict)

    @property
    def ok(self) -> bool:
        return self.status is StageStatus.SUCCESS


@dataclass
class PipelineResult:
    """Outcome of a full pipeline run."""

    pipeline_name: str
    status: StageStatus
    elapsed_s: float = 0.0
    batches_processed: int = 0
    total_packets: int = 0
    stage_results: list[StageResult] = field(default_factory=list)
    errors: list[str] = field(default_factory=list)

    @property
    def ok(self) -> bool:
        return self.status is StageStatus.SUCCESS

    def summary(self) -> str:
        lines = [
            f"Pipeline '{self.pipeline_name}': {self.status.value.upper()}",
            f"  elapsed: {self.elapsed_s:.3f}s"
            f"  batches: {self.batches_processed}"
            f"  packets: {self.total_packets}",
        ]
        for r in self.stage_results:
            lines.append(
                f"  [{r.status.value:>7}] {r.stage_name}: "
                f"{r.records_in} -> {r.records_out} rows in {r.elapsed_s:.3f}s"
                + (f" ({r.error})" if r.error else "")
            )
        if self.errors:
            lines.append(f"  errors ({len(self.errors)}):")
            lines.extend(f"    - {e}" for e in self.errors)
        return "\n".join(lines)
