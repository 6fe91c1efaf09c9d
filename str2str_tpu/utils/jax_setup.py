"""Process-wide JAX configuration: persistent compilation cache, flags.

First compile of the jitted anneal scan costs minutes on TPU; the persistent
cache makes every later process start warm. Call `setup()` early from entry
points (CLIs, bench, tests don't need it).
"""
from __future__ import annotations

import os
from pathlib import Path

_DONE = False


def setup(cache_dir: str | None = None):
    global _DONE
    if _DONE:
        return
    import jax

    cache = Path(cache_dir or os.environ.get(
        "STR2STR_CACHE_DIR", str(Path.home() / ".cache" / "str2str_tpu")))
    comp = cache / "xla_compilation"
    comp.mkdir(parents=True, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", str(comp))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    # Multi-host: bring up jax.distributed before the first backend touch
    # when a coordinator is configured (JAX_COORDINATOR_ADDRESS /
    # JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars; autodetected on pods).
    from ..parallel.mesh import init_distributed
    init_distributed()
    _DONE = True
