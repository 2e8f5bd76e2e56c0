"""Event hooks.

Parity: reference ``src/mdp/observability/hooks.py:26-97`` —
``EventHook.fire`` swallows (and logs) handler exceptions (``:40-44``);
``HookManager`` pre-creates the built-in pipeline events (``:63-70``).
The reference never actually fires these from its Pipeline (documented
discrepancy R2); our Pipeline does.
"""

from __future__ import annotations

import logging
from collections.abc import Callable
from typing import Any

log = logging.getLogger("mission_data_pipeline_spark.hooks")

BUILTIN_EVENTS = (
    "pipeline.start",
    "pipeline.complete",
    "batch.extracted",
    "batch.transformed",
    "batch.loaded",
    "stage.error",
)


class EventHook:
    def __init__(self, name: str) -> None:
        self.name = name
        self._handlers: list[Callable[..., Any]] = []

    def register(self, handler: Callable[..., Any]) -> Callable[..., Any]:
        self._handlers.append(handler)
        return handler

    def unregister(self, handler: Callable[..., Any]) -> None:
        self._handlers.remove(handler)

    def fire(self, **kwargs: Any) -> None:
        for h in list(self._handlers):
            try:
                h(**kwargs)
            except Exception:  # noqa: BLE001 - hook errors never break the run
                log.exception("hook handler failed", extra={"event": self.name})

    def __len__(self) -> int:
        return len(self._handlers)


class HookManager:
    def __init__(self) -> None:
        self._hooks: dict[str, EventHook] = {e: EventHook(e) for e in BUILTIN_EVENTS}

    def hook(self, name: str) -> EventHook:
        return self._hooks.setdefault(name, EventHook(name))

    def on(self, name: str) -> Callable[[Callable[..., Any]], Callable[..., Any]]:
        return self.hook(name).register

    def fire(self, name: str, **kwargs: Any) -> None:
        if name in self._hooks:
            self._hooks[name].fire(**kwargs)

    def events(self) -> list[str]:
        return sorted(self._hooks)
