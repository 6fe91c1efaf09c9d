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


def load_checkpoint(path: str, target: Optional[Any] = None) -> Dict[str, Any]:
    """Restore a checkpoint. With `target`, orbax rebuilds the exact pytree
    structure (namedtuple optimizer states included) instead of returning
    nested dicts; extra keys missing from the checkpoint fall back to the
    target's values (back-compat with older checkpoints)."""
    path = str(Path(path).absolute())
    ckpt = _checkpointer().restore(path)
    if target is None:
        return ckpt

    def rebuild(tmpl, saved):
        """Name-directed structural rebuild: dicts and namedtuples match by
        key/field name (orbax serializes namedtuples as dicts, and leaf ORDER
        differs between dict-sorted and field order — never zip leaves)."""
        if saved is None:
            return tmpl
        if isinstance(tmpl, dict):
            if not isinstance(saved, dict):
                return tmpl
            return {k: rebuild(v, saved.get(k)) for k, v in tmpl.items()}
        if hasattr(tmpl, "_fields"):  # namedtuple (optax states)
            get = (saved.get if isinstance(saved, dict)
                   else lambda f: getattr(saved, f, None))
            return type(tmpl)(**{f: rebuild(getattr(tmpl, f), get(f))
                                 for f in tmpl._fields})
        if isinstance(tmpl, (list, tuple)):
            if isinstance(saved, dict):  # orbax may key sequences as "0","1"
                saved_seq = [saved.get(str(i)) for i in range(len(tmpl))]
            elif isinstance(saved, (list, tuple)) and len(saved) == len(tmpl):
                saved_seq = list(saved)
            else:
                return tmpl
            out = [rebuild(t, s) for t, s in zip(tmpl, saved_seq)]
            return out if isinstance(tmpl, list) else type(tmpl)(out)
        return saved  # leaf

    return rebuild(target, ckpt)


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


# ---------------------------------------------------------------------------
# Compact committed-weights format: a single .npz of flattened param paths.
# Used for the in-repo trained checkpoint fixture (orbax dirs are great for
# resume state but unwieldy as repo artifacts).

def save_params_npz(params, path: str, dtype=None):
    """Save a params pytree as one .npz keyed by 'a/b/c' paths. dtype
    (e.g. jnp.bfloat16) optionally downcasts floating leaves for size —
    bf16 halves the file and is well below the sampler's seed noise."""
    import jax
    import numpy as np

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for kp, leaf in flat:
        key = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                       for k in kp)
        arr = np.asarray(leaf)
        if dtype is not None and np.issubdtype(arr.dtype, np.floating):
            arr = arr.astype(dtype)
        out[key] = arr
    from pathlib import Path as _P
    _P(path).parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **out)


def load_params_npz(path: str, cast=None):
    """Load a params pytree saved by save_params_npz. cast (e.g.
    jnp.float32) optionally upcasts floating leaves."""
    import numpy as np

    import ml_dtypes

    data = np.load(path)
    tree: dict = {}
    for key in data.files:
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        arr = data[key]
        if arr.dtype.kind == "V" and arr.dtype.itemsize == 2:
            # bf16 round-trips through np.savez as an opaque 2-byte void.
            arr = arr.view(ml_dtypes.bfloat16)
        if cast is not None and (arr.dtype == ml_dtypes.bfloat16
                                 or np.issubdtype(arr.dtype, np.floating)):
            arr = arr.astype(cast)
        node[parts[-1]] = arr
    return tree
