"""Shared helpers for the fused Pallas kernel family (edge embedder, edge
MLP, IPA attention)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

try:  # the TPU backend may be absent on CPU-only hosts
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None


def is_tpu() -> bool:
    """True when the default device runs the Mosaic TPU backend."""
    if pltpu is None:
        return False
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def cp(nbytes: int):
    """Raised scoped-VMEM limit for kernels whose working set exceeds the
    16 MB compiler default (v5e has 128 MB of physical VMEM)."""
    if pltpu is None:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=nbytes)


def emit_proj(oc, wcatT_ref, bcat_ref, proj_ref):
    """Mega-fusion projection emission from an in-VMEM output tile:

        proj[r, x, l] = sum_c oc[r, l, c] * wcatT[x, c] + bcat[x]

    written to proj_ref[0] (R, X, L). Per-row dot_general in Mosaic-fast
    contract-dim1/dim1 form — the batched broadcast-wT variant hits a
    Mosaic vector_extract_slice crash (see scripts/ablate_edge_mlp.py)."""
    dt = proj_ref.dtype
    oc = oc.astype(dt)
    wT = wcatT_ref[:].astype(dt)
    rows = []
    for r in range(oc.shape[0]):
        rows.append(jax.lax.dot_general(
            wT, oc[r], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32))          # (X, L)
    proj = jnp.stack(rows, axis=0)                        # (R, X, L) f32
    proj = proj + bcat_ref[0][None, :, None]
    proj_ref[0] = proj.astype(dt)
