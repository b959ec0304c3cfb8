"""Operational logging: rotating INFO + WARNING-and-up files.

Parity with the reference's logging_config.py:5-29 (RotatingFileHandler
info.log maxBytes=10MB backupCount=2, plus an error.log at WARNING),
re-homed for an engine: the log directory is an explicit argument (the
reference derives it from cwd, which breaks the moment the process
isn't launched from the expected directory), and handlers attach to the
package logger, not the root logger, so the engine never hijacks a host
application's logging.

At cluster scale these are DRIVER logs (run orchestration: files
discovered, loaded, quarantined). Executor-side events belong to the
audit table — the queryable signal — and Spark's own executor logs.
"""

from __future__ import annotations

import logging
import os
from logging.handlers import RotatingFileHandler

PACKAGE_LOGGER = "reactionetl_etl_spark"

_FORMAT = "%(name)s logger - %(asctime)s: %(levelname)s: %(message)s"


def setup_logging(
    log_dir: str,
    max_bytes: int = 10_000_000,
    backup_count: int = 2,
) -> logging.Logger:
    """Attach rotating info.log (INFO+) and error.log (WARNING+)
    handlers to the package logger. Idempotent: repeated calls with the
    same directory don't stack duplicate handlers."""
    os.makedirs(log_dir, exist_ok=True)
    logger = logging.getLogger(PACKAGE_LOGGER)
    logger.setLevel(logging.INFO)

    info_path = os.path.join(log_dir, "info.log")
    error_path = os.path.join(log_dir, "error.log")
    existing = {
        getattr(h, "baseFilename", None) for h in logger.handlers
    }
    formatter = logging.Formatter(_FORMAT)

    if os.path.abspath(info_path) not in existing:
        rotating = RotatingFileHandler(info_path, maxBytes=max_bytes, backupCount=backup_count)
        rotating.setLevel(logging.INFO)
        rotating.setFormatter(formatter)
        logger.addHandler(rotating)
    if os.path.abspath(error_path) not in existing:
        error_handler = logging.FileHandler(error_path, mode="a")
        error_handler.setLevel(logging.WARNING)
        error_handler.setFormatter(formatter)
        logger.addHandler(error_handler)
    return logger


def get_logger(name: str) -> logging.Logger:
    """Module logger under the package hierarchy (so setup_logging's
    handlers apply): get_logger('etl.pipeline') →
    'reactionetl_etl_spark.etl.pipeline'."""
    return logging.getLogger(f"{PACKAGE_LOGGER}.{name}")
