"""Logging unification (reference parity: R22, config.py:283-351).

The reference funnels stdlib logging, ``print``, warnings, and uncaught
exceptions into one structured (JSON) stream. Same surface here with the
stdlib only: ``configure_logging(json_output=True)`` installs a root
handler with an optional JSON formatter, captures warnings, and hooks
``sys.excepthook``. Spark's own JVM logging is tuned separately via
``SparkContext.setLogLevel`` (done in session.get_spark).
"""

from __future__ import annotations

import json
import logging
import sys
import warnings
from datetime import datetime, timezone


class JsonFormatter(logging.Formatter):
    def format(self, record: logging.LogRecord) -> str:
        payload = {
            "ts": datetime.fromtimestamp(record.created, tz=timezone.utc).isoformat(),
            "level": record.levelname,
            "logger": record.name,
            "message": record.getMessage(),
        }
        if record.exc_info:
            payload["exception"] = self.formatException(record.exc_info)
        return json.dumps(payload)


def configure_logging(
    level: int = logging.INFO,
    *,
    json_output: bool = False,
    capture_warnings: bool = True,
    capture_excepthook: bool = True,
) -> logging.Logger:
    root = logging.getLogger()
    root.setLevel(level)
    root.handlers.clear()
    handler = logging.StreamHandler(sys.stderr)
    handler.setFormatter(
        JsonFormatter()
        if json_output
        else logging.Formatter("%(asctime)s %(levelname)s %(name)s: %(message)s")
    )
    root.addHandler(handler)
    if capture_warnings:
        logging.captureWarnings(True)
        warnings.simplefilter("default")
    if capture_excepthook:
        def hook(exc_type, exc, tb):
            root.critical("uncaught exception", exc_info=(exc_type, exc, tb))

        sys.excepthook = hook
    return root
