"""Structured logging setup.

Parity: reference ``src/mdp/observability/logging.py:17-74`` — console
vs json render modes. The reference constructs its renderers and then
discards them, so its ``fmt`` flag has no effect (documented bug R4);
here the flag is honored. structlog is optional — when absent, stdlib
logging with an equivalent JSON/console formatter is used.
"""

from __future__ import annotations

import json
import logging
import sys
import time

try:  # optional dependency
    import structlog  # type: ignore
except ImportError:
    structlog = None  # type: ignore[assignment]


class _JsonFormatter(logging.Formatter):
    def format(self, record: logging.LogRecord) -> str:
        payload = {
            "ts": round(time.time(), 3),
            "level": record.levelname.lower(),
            "logger": record.name,
            "event": record.getMessage(),
        }
        for k, v in record.__dict__.items():
            if k in ("event", "ts", "level", "logger"):
                continue
            if k.startswith("ctx_"):
                payload[k[4:]] = v
        return json.dumps(payload)


def configure_logging(level: str = "INFO", fmt: str = "console") -> logging.Logger:
    """Configure engine logging; ``fmt`` is ``console`` or ``json``."""
    if fmt not in ("console", "json"):
        raise ValueError(f"fmt must be 'console' or 'json', got {fmt!r}")
    root = logging.getLogger("mission_data_pipeline_spark")
    root.setLevel(level.upper())
    root.handlers.clear()
    handler = logging.StreamHandler(sys.stderr)
    if structlog is not None:
        renderer = (
            structlog.processors.JSONRenderer()
            if fmt == "json"
            else structlog.dev.ConsoleRenderer()
        )
        structlog.configure(
            processors=[
                structlog.processors.add_log_level,
                structlog.processors.TimeStamper(fmt="iso"),
                renderer,
            ]
        )
        handler.setFormatter(logging.Formatter("%(message)s"))
    elif fmt == "json":
        handler.setFormatter(_JsonFormatter())
    else:
        handler.setFormatter(
            logging.Formatter("%(asctime)s %(levelname)-7s %(name)s %(message)s")
        )
    root.addHandler(handler)
    root.propagate = False
    return root
