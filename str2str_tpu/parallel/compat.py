"""JAX version compatibility shims.

`jax.experimental.shard_map` warns "deprecated since v0.8.0" on every
import; the public API is `jax.shard_map`, whose replication-check kwarg
was renamed check_rep -> check_vma. This module exposes one `shard_map`
with the old keyword surface so call sites stay unchanged and the repo is
warning-free on jax >= 0.8 while still importing on older versions.
"""
from __future__ import annotations

import jax

__all__ = ["shard_map"]

if hasattr(jax, "shard_map"):

    def shard_map(f, mesh, in_specs, out_specs, check_rep=True):
        return jax.shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=check_rep)

else:  # pragma: no cover - old jax fallback
    from jax.experimental.shard_map import shard_map  # type: ignore # noqa: F401
