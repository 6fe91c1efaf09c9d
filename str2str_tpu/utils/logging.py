"""Process-aware stdlib logging (replaces the reference RankedLogger,
pylogger.py:7-51; rank prefixes come from jax.process_index)."""
from __future__ import annotations

import logging
import os
import sys


class _RankFormatter(logging.Formatter):
    """Resolves the process rank LAZILY at record-format time.

    Calling jax.process_index() eagerly in get_logger would initialize the
    JAX backend at import time of any module with a module-level logger —
    BEFORE jax_setup.setup()/init_distributed() runs, which breaks
    multi-host bring-up (jax.distributed.initialize must precede the first
    backend touch). The rank comes from JAX_PROCESS_ID when set (the same
    env var init_distributed consumes), else from jax.process_index() only
    once the backend is already initialized; never triggers init itself."""

    _rank: int | None = None

    def format(self, record):
        if _RankFormatter._rank is None:
            env = os.environ.get("JAX_PROCESS_ID")
            if env is not None:
                _RankFormatter._rank = int(env)
            else:
                try:
                    from jax._src import xla_bridge
                    if getattr(xla_bridge, "_backends", None):
                        import jax
                        _RankFormatter._rank = jax.process_index()
                except Exception:
                    pass
        record.rank = 0 if _RankFormatter._rank is None else _RankFormatter._rank
        return super().format(record)


def get_logger(name: str = "str2str_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(_RankFormatter(
            "[%(asctime)s][rank%(rank)s][%(name)s][%(levelname)s] %(message)s",
            datefmt="%H:%M:%S"))
        logger.addHandler(handler)
        logger.setLevel(os.environ.get("STR2STR_LOGLEVEL", "INFO").upper())
        logger.propagate = False
    return logger
