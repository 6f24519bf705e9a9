"""Process-aware logging (reference ``warpconvnet/utils/logger.py:43`` —
rank-aware colored logger). On TPU the "rank" is ``jax.process_index()``."""

from __future__ import annotations

import logging
import os
import sys
from typing import Optional

_LOGGERS = {}


def _process_index() -> int:
    try:
        import jax

        return jax.process_index()
    except Exception:
        return 0


class ProcessFilter(logging.Filter):
    """Attach process index; optionally drop records on non-zero processes."""

    def __init__(self, zero_only: bool = False):
        super().__init__()
        self.zero_only = zero_only

    def filter(self, record: logging.LogRecord) -> bool:
        record.process_index = _process_index()
        if self.zero_only and record.process_index != 0:
            return False
        return True


def get_logger(name: str = "warpconvnet_tpu", zero_only: bool = True) -> logging.Logger:
    key = (name, zero_only)
    if key in _LOGGERS:
        return _LOGGERS[key]
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(
            logging.Formatter("[%(levelname)s p%(process_index)s %(name)s] %(message)s")
        )
        handler.addFilter(ProcessFilter(zero_only=zero_only))
        logger.addHandler(handler)
        logger.setLevel(os.environ.get("WCT_LOG_LEVEL", "WARNING").upper())
        logger.propagate = False
    _LOGGERS[key] = logger
    return logger
