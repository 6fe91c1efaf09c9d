"""Checkpoint save/load (orbax), replacing Lightning's ModelCheckpoint +
the reference's raw-.pth loader (checkpoint_utils.py:3-27)."""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_checkpoint(path: str, state: Dict[str, Any],
                    metadata: Optional[dict] = None):
    """Save a pytree (params / opt_state / step ...) to `path` (a directory)."""
    path = Path(path).absolute()
    path.parent.mkdir(parents=True, exist_ok=True)
    state = jax.tree.map(np.asarray, state)
    _checkpointer().save(str(path), state, force=True)
    if metadata is not None:
        (path / "metadata.json").write_text(json.dumps(metadata, default=str))


def load_checkpoint(path: str) -> Dict[str, Any]:
    return _checkpointer().restore(str(Path(path).absolute()))


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    d = Path(ckpt_dir)
    if not d.exists():
        return None
    cands = sorted([p for p in d.iterdir() if p.is_dir() and
                    p.name.startswith("step_")],
                   key=lambda p: int(p.name.split("_")[1]))
    return str(cands[-1]) if cands else None


def prune_checkpoints(ckpt_dir: str, keep: int):
    import shutil
    d = Path(ckpt_dir)
    if not d.exists():
        return
    cands = sorted([p for p in d.iterdir() if p.is_dir()
                    and p.name.startswith("step_")],
                   key=lambda p: int(p.name.split("_")[1]))
    for p in cands[:-keep] if keep > 0 else []:
        shutil.rmtree(p, ignore_errors=True)
