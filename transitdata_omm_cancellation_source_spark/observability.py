"""Operational surfaces (SURVEY §2.8): structured JSON logging and the
slow-cycle SLO check.

- The reference logs through logback with a JSON encoder
  (``logback.xml:2-14``); here the standard ``logging`` module gets a
  JSON formatter so every engine log line is one machine-parseable
  object.
- The reference warns when one poll cycle (query + process) exceeds
  4000 ms (``OmmConnector.java:86-89``) — its only SLO.  The poller
  times each cycle with an injectable clock and calls
  ``warn_if_slow``; batch-mode and Structured Streaming share the
  same check (for streams it is the ``foreachBatch`` body, so the
  measured span matches the reference's query+handle window).
"""

from __future__ import annotations

import json
import logging
import sys
import time

#: OmmConnector.java:86-89 — "Database query is slow" above this.
SLOW_CYCLE_THRESHOLD_MS = 4000


class JsonFormatter(logging.Formatter):
    """One JSON object per line: timestamp, level, logger, message,
    plus any ``extra={"fields": {...}}`` structured payload."""

    def format(self, record: logging.LogRecord) -> str:
        doc = {
            "ts": self.formatTime(record, "%Y-%m-%dT%H:%M:%S%z"),
            "level": record.levelname,
            "logger": record.name,
            "message": record.getMessage(),
        }
        fields = getattr(record, "fields", None)
        if fields:
            doc.update(fields)
        if record.exc_info:
            doc["exception"] = self.formatException(record.exc_info)
        return json.dumps(doc, default=str)


def get_json_logger(name: str = "transitdata_omm") -> logging.Logger:
    """Logger with a single stderr JSON handler (idempotent)."""
    logger = logging.getLogger(name)
    if not any(
        isinstance(h.formatter, JsonFormatter) for h in logger.handlers
    ):
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(JsonFormatter())
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
        logger.propagate = False
    return logger


def warn_if_slow(
    logger: logging.Logger,
    duration_ms: float,
    threshold_ms: float = SLOW_CYCLE_THRESHOLD_MS,
) -> bool:
    """The reference's slow-cycle check; returns True when warned."""
    if duration_ms > threshold_ms:
        logger.warning(
            "Poll cycle slower than SLO",
            extra={
                "fields": {
                    "duration_ms": round(duration_ms, 1),
                    "threshold_ms": threshold_ms,
                }
            },
        )
        return True
    return False


def monotonic_ms() -> float:
    return time.perf_counter() * 1000.0
