"""Process-wide logging setup (reference analog).

Mirrors /root/reference/src/logging_config.py:6-36: configure the
root logger exactly once per process with a rotating file handler
(10 MiB × 5 backups) plus a console handler, level and file path
driven by ``LOG_LEVEL`` / ``LOG_FILE``. Python-side only — executor
JVM logging stays under log4j; this covers the driver-side runner,
which is where the reference logs too.
"""

from __future__ import annotations

import logging
import os
from logging.handlers import RotatingFileHandler

_CONFIGURED_FLAG = "_pipeline_logging_configured"

FORMAT = "%(asctime)s - %(levelname)s - %(name)s - %(message)s"
DATEFMT = "%Y-%m-%d %H:%M:%S"
MAX_BYTES = 10 * 1024 * 1024
BACKUP_COUNT = 5


def setup_logging(log_file: str | None = None, level: str | None = None) -> None:
    """Configure logging once for the whole process (file + console).

    Idempotent (re-calls are no-ops, logging_config.py:8-9); removes
    pre-existing root handlers so a partial earlier configuration
    can't double-log (logging_config.py:18-20)."""
    if getattr(logging, _CONFIGURED_FLAG, False):
        return

    log_level = getattr(
        logging,
        (level or os.environ.get("LOG_LEVEL", "INFO")).upper(),
        logging.INFO,
    )
    path = log_file or os.environ.get("LOG_FILE", "app.log")

    root = logging.getLogger()
    root.setLevel(log_level)
    for handler in list(root.handlers):
        root.removeHandler(handler)

    formatter = logging.Formatter(FORMAT, datefmt=DATEFMT)

    fh = RotatingFileHandler(
        path, maxBytes=MAX_BYTES, backupCount=BACKUP_COUNT, encoding="utf-8"
    )
    fh.setLevel(log_level)
    fh.setFormatter(formatter)
    root.addHandler(fh)

    ch = logging.StreamHandler()
    ch.setLevel(log_level)
    ch.setFormatter(formatter)
    root.addHandler(ch)

    setattr(logging, _CONFIGURED_FLAG, True)


def clear_configured_flag() -> None:
    """Allow a re-configuration (test isolation only)."""
    if getattr(logging, _CONFIGURED_FLAG, False):
        delattr(logging, _CONFIGURED_FLAG)
