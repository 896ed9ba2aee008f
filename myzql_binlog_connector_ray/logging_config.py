"""Logging configuration — parity with the reference's log_config
(src/log_config.zig:20-96):

- runtime log-level threshold (debug | info | warn | err);
- optional plain-text file sink (opened with truncate, no ANSI color),
  formatted ``level(scope): message`` exactly like the reference's
  file path;
- colored stderr output by default (level-colored prefix);
- scoped loggers: ``get_logger("decode")`` → messages carry the
  ``(decode)`` scope prefix; the default scope prints no prefix.

The reference installs a comptime logFn; here the same behavior is a
handler pair on the ``myzql`` logger hierarchy. ``init()`` is idempotent
and only the CLI/bench entry points call it — library code just calls
``get_logger(scope)``.
"""

from __future__ import annotations

import logging
import sys
from typing import Optional

_ROOT = "myzql"

LEVELS = {
    "debug": logging.DEBUG,
    "info": logging.INFO,
    "warn": logging.WARNING,
    "err": logging.ERROR,
    "error": logging.ERROR,
}

_COLORS = {
    logging.DEBUG: "\x1b[36m",  # cyan
    logging.INFO: "\x1b[32m",  # green
    logging.WARNING: "\x1b[33m",  # yellow
    logging.ERROR: "\x1b[31m",  # red
}
_RESET = "\x1b[0m"

_LEVEL_TEXT = {
    logging.DEBUG: "debug",
    logging.INFO: "info",
    logging.WARNING: "warning",
    logging.ERROR: "error",
}


def _scope_of(record: logging.LogRecord) -> str:
    # logger name "myzql.decode" → scope "decode"; bare "myzql" → default
    parts = record.name.split(".", 1)
    return parts[1] if len(parts) > 1 else ""


class _PlainFormatter(logging.Formatter):
    """File sink format: ``level(scope): message`` (no color), matching
    the reference's file output byte layout."""

    def format(self, record: logging.LogRecord) -> str:
        level = _LEVEL_TEXT.get(record.levelno, record.levelname.lower())
        scope = _scope_of(record)
        prefix = f"{level}({scope})" if scope else level
        return f"{prefix}: {record.getMessage()}"


class _ColorFormatter(logging.Formatter):
    """Stderr format: colored level prefix (the reference's default path)."""

    def format(self, record: logging.LogRecord) -> str:
        level = _LEVEL_TEXT.get(record.levelno, record.levelname.lower())
        scope = _scope_of(record)
        prefix = f"{level}({scope})" if scope else level
        color = _COLORS.get(record.levelno, "")
        return f"{color}{prefix}{_RESET}: {record.getMessage()}"


def init(level: str = "info", log_file: Optional[str] = None) -> logging.Logger:
    """Install the runtime threshold and sink. Idempotent: replaces any
    handlers from a previous init (re-running truncates the log file,
    like the reference's O_TRUNC open)."""
    root = logging.getLogger(_ROOT)
    root.setLevel(LEVELS.get(level, logging.INFO))
    root.propagate = False
    for h in list(root.handlers):
        root.removeHandler(h)
        h.close()
    handler: Optional[logging.Handler] = None
    if log_file:
        try:
            handler = logging.FileHandler(log_file, mode="w", encoding="utf-8")
            handler.setFormatter(_PlainFormatter())
        except OSError:
            # reference parity: an unopenable log file falls back to the
            # colored stderr path instead of failing the run
            # (src/log_config.zig:24-29, `catch null`)
            handler = None
    if handler is None:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(_ColorFormatter())
    root.addHandler(handler)
    return root


def get_logger(scope: str = "") -> logging.Logger:
    """Scoped logger: messages print as ``level(scope): ...``."""
    return logging.getLogger(f"{_ROOT}.{scope}" if scope else _ROOT)


class _EmptySortPartitionFilter(logging.Filter):
    """Drop Ray Data's schema-divergence warning ONLY for empty bundles.

    Ray's sort-based shuffle materializes empty partitions as 0-column
    tables (ray/data/_internal/arrow_block.py ``_empty_table``), which
    trips the streaming executor's schema check (``new schema: .`` —
    the empty schema renders as nothing) even when every non-empty
    block agrees. Genuine divergences — a non-empty differing schema —
    still pass through."""

    def filter(self, record: logging.LogRecord) -> bool:  # True = keep
        msg = record.getMessage()
        return not (
            "Operator produced a RefBundle with a different schema" in msg
            and "new schema: ." in msg
        )


def quiet_empty_partition_warnings() -> None:
    """Install the empty-sort-partition filter on the (driver-side)
    streaming executor logger. Called by bench/CLI entry points."""
    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).addFilter(_EmptySortPartitionFilter())
