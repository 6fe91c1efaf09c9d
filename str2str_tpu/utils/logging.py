"""Process-aware stdlib logging (replaces the reference RankedLogger,
pylogger.py:7-51; rank prefixes come from jax.process_index)."""
from __future__ import annotations

import logging
import os
import sys


def get_logger(name: str = "str2str_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stderr)
        rank = 0
        try:
            import jax
            rank = jax.process_index()
        except Exception:
            pass
        handler.setFormatter(logging.Formatter(
            f"[%(asctime)s][rank{rank}][%(name)s][%(levelname)s] %(message)s",
            datefmt="%H:%M:%S"))
        logger.addHandler(handler)
        logger.setLevel(os.environ.get("STR2STR_LOGLEVEL", "INFO").upper())
        logger.propagate = False
    return logger
