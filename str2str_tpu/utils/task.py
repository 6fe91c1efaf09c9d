"""Task wrapper: crash-safe entry points (reference utils.task_wrapper,
utils.py:43-95).

Wraps a CLI main so that exceptions are logged to a file under the output
dir before re-raising, and experiment loggers are finalized even on crash
(so a dying wandb/tensorboard run flushes instead of corrupting). Sweeps
rely on this to keep going when one trial dies.
"""
from __future__ import annotations

import functools
import traceback
from pathlib import Path
from typing import Callable, Optional

from .logging import get_logger

log = get_logger(__name__)


def task_wrapper(fn: Callable) -> Callable:
    """Decorator for CLI mains. The wrapped function may attach loggers to
    finalize on exit via `task_wrapper.finalize_on_exit(loggers)`."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        _finalizers.clear()
        try:
            return fn(*args, **kwargs)
        except Exception:
            out_dir = Path(_crash_dir[0] or ".")
            try:
                out_dir.mkdir(parents=True, exist_ok=True)
                (out_dir / "crash.log").write_text(traceback.format_exc())
                log.error(f"task crashed; traceback at {out_dir / 'crash.log'}")
            except OSError:
                pass
            raise
        finally:
            for finalize in _finalizers:
                try:
                    finalize()
                except Exception as e:  # a dying logger must not mask errors
                    log.warning(f"logger finalize failed: {e}")

    return wrapped


_finalizers: list = []
_crash_dir: list = [None]


def finalize_on_exit(loggers) -> None:
    """Register experiment loggers to be finalized when the task exits."""
    _finalizers.append(loggers.finalize)


def set_crash_dir(path: str) -> None:
    _crash_dir[0] = path


def extras(cfg) -> None:
    """Apply the `extras` config group before the task runs (reference
    utils.extras, utils.py:12-40 + configs/extras/default.yaml):
    ignore_warnings silences python warnings, enforce_tags requires a
    non-empty `tags` list (warning here — the reference prompts
    interactively, which has no non-interactive equivalent)."""
    ex = cfg.get("extras") or {}
    if ex.get("ignore_warnings"):
        import warnings
        log.info("extras.ignore_warnings=true: disabling python warnings")
        warnings.filterwarnings("ignore")
    if ex.get("enforce_tags") and not cfg.get("tags"):
        log.warning("extras.enforce_tags=true but no tags given; "
                    "set tags='[...]' to identify the run")


def print_config_enabled(cfg) -> bool:
    ex = cfg.get("extras") or {}
    return bool(ex.get("print_config", True))
