"""Structured log surface: global + per-connector file logs.

Parity with the reference's ``airbyte/logs.py``:

- log root resolution: ``AIRBYTE_LOGGING_ROOT`` env override, else
  ``<tmp>/airbyte/logs`` (``logs.py:83-114``); unwritable root degrades
  to console-only with a one-time warning, never an exception;
- :func:`get_global_file_logger` — one rolling per-session file for
  engine events (``logs.py:129-205``);
- :func:`new_passthrough_file_logger` — a per-connector logger writing
  under ``<root>/<connector_name>/`` (``logs.py:281-330``), which the
  subprocess host feeds with the connector's stderr;
- ``AIRBYTE_STRUCTURED_LOGGING=true`` switches file lines to JSON
  (stdlib formatter here — same wire shape, no structlog dependency).
"""

from __future__ import annotations

import json
import logging
import os
import sys
import tempfile
import time
import uuid
import warnings
from functools import lru_cache
from pathlib import Path

_WARNED: set[str] = set()


def warn_once(message: str) -> None:
    """Emit a warning only once per process (reference ``logs.py:49-79``)."""
    if message in _WARNED:
        return
    _WARNED.add(message)
    warnings.warn(message, stacklevel=2)


def _structured() -> bool:
    return os.environ.get("AIRBYTE_STRUCTURED_LOGGING", "").lower() in (
        "1",
        "true",
        "yes",
    )


def _get_logging_root() -> Path | None:
    if "AIRBYTE_LOGGING_ROOT" in os.environ:
        root = Path(os.environ["AIRBYTE_LOGGING_ROOT"])
    else:
        root = Path(tempfile.gettempdir()) / "airbyte" / "logs"
    try:
        root.mkdir(parents=True, exist_ok=True)
    except OSError:
        warn_once(
            f"Failed to create logging directory at `{root}`. Override the "
            "path with the AIRBYTE_LOGGING_ROOT environment variable."
        )
        return None
    return root


class _JsonFormatter(logging.Formatter):
    def format(self, record: logging.LogRecord) -> str:
        return json.dumps(
            {
                "ts": time.strftime(
                    "%Y-%m-%d %H:%M:%S", time.gmtime(record.created)
                ),
                "level": record.levelname.lower(),
                "logger": record.name,
                "event": record.getMessage(),
            },
            default=str,
        )


def _file_handler(path: Path) -> logging.FileHandler:
    handler = logging.FileHandler(path, encoding="utf-8")
    handler.setLevel(logging.INFO)
    handler.setFormatter(
        _JsonFormatter()
        if _structured()
        else logging.Formatter("%(asctime)s %(levelname)s %(message)s")
    )
    return handler


def _session_suffix() -> str:
    return uuid.uuid4().hex[:9]


@lru_cache
def get_global_file_logger() -> logging.Logger | None:
    """The engine-wide file logger (one file per session), or None when
    no log directory is writable."""
    logger = logging.getLogger("pyairbyte_spark")
    logger.setLevel(logging.INFO)
    logger.propagate = False
    root = _get_logging_root()
    if root is None:
        return None
    path = root / f"pyairbyte-spark-log-{_session_suffix()}.log"
    logger.addHandler(_file_handler(path))
    logger.info("Session logging started: %s", path)
    return logger


def get_global_log_paths() -> list[Path]:
    """Existing session log files, newest first (debug convenience)."""
    root = _get_logging_root()
    if root is None:
        return []
    return sorted(
        root.glob("pyairbyte-spark-log-*.log"),
        key=lambda p: p.stat().st_mtime,
        reverse=True,
    )


def new_passthrough_file_logger(connector_name: str) -> logging.Logger:
    """Per-connector file logger under ``<root>/<connector_name>/``.

    Each call opens a fresh log file (one per connector run) — the
    subprocess host routes the connector's stderr lines here, so a
    failed sync leaves a readable artifact instead of a truncated
    in-memory tail.
    """
    logger = logging.getLogger(
        f"pyairbyte_spark.{connector_name}.{_session_suffix()}"
    )
    logger.setLevel(logging.INFO)
    logger.propagate = False
    root = _get_logging_root()
    if root is None:
        return logger
    folder = root / connector_name
    try:
        folder.mkdir(parents=True, exist_ok=True)
    except OSError:
        return logger
    path = folder / f"{connector_name}-log-{_session_suffix()}.log"
    logger.addHandler(_file_handler(path))
    global_logger = get_global_file_logger()
    msg = f"Writing `{connector_name}` logs to file: {path}"
    print(msg, file=sys.stderr)
    if global_logger:
        global_logger.info(msg)
    return logger


def logger_file_path(logger: logging.Logger) -> Path | None:
    """The file a logger writes to, if any (test/debug helper)."""
    for handler in logger.handlers:
        if isinstance(handler, logging.FileHandler):
            return Path(handler.baseFilename)
    return None
