"""Sequence-sharded (long-context) execution helpers.

The reference caps sequence length at 500 because its IPA trunk
materializes O(L^2) edge tensors on one device (SURVEY §5.7; reference
configs/data/protein.yaml:10-11, ipa.py:183-258). The TPU-native answer:
shard the KEY/column axis of every O(L^2) tensor over a mesh axis and run
the whole score network inside `shard_map`:

  * each device builds and carries only its column shard of the edge
    embedding, z[:, :, j0:j0+Lk, :] — O(L^2)/n_devices memory;
  * node-sized tensors (embeddings, frames, masks — O(L)) stay replicated,
    so every node-level layer (transformer, transitions, backbone update)
    runs unchanged;
  * IPA attention computes partial logits/outputs over local keys; the
    softmax is made exact with one pmax (global max) + psum (normalizer),
    and the three output streams combine with one psum each — the
    compiler-scheduled ICI collectives replace ring attention for this
    pattern;
  * EdgeTransition is pointwise over (i, j): it consumes the local z shard
    plus column-sliced node contributions and emits the next local shard —
    no communication at all.

Outputs of every attention psum are replicated, so the network's results
(and the whole sampling scan around it) are bitwise identical on every
device; `shard_map` out_specs are replicated with check_rep disabled.

Entered via `ScoreNetwork.cfg.seq_axis` + `Sampler(seq_mesh=...)`
(cli.sample flag `model.net.seq_axis`); parity vs the unsharded trunk is
tested in tests/test_seq_shard.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

SEQ_AXIS = "seq"


def axis_size(axis: str) -> int:
    """Static size of a shard_map/pmap axis (psum of a Python scalar is
    evaluated at trace time)."""
    return jax.lax.psum(1, axis)


def local_cols(axis: str, *arrays):
    """Slice this device's column shard out of replicated (B, L, ...) node
    arrays: returns each array[:, j0:j0+Lk] for shard index j0//Lk.

    L must divide evenly by the mesh-axis size — otherwise the trailing
    L % n columns would silently fall out of every softmax normalizer and
    output psum (wrong results, no error). Length buckets are padded to a
    multiple of the mesh size by the caller (sampling/sampler.py)."""
    n = axis_size(axis)
    idx = jax.lax.axis_index(axis)
    outs = []
    for a in arrays:
        L = a.shape[1]
        if L % n:
            raise ValueError(
                f"sequence length {L} is not divisible by the '{axis}' mesh "
                f"axis size {n}; pad the length bucket to a multiple of the "
                f"mesh size")
        Lk = L // n
        starts = (jnp.zeros((), jnp.int32), idx.astype(jnp.int32) * Lk) + \
            tuple(jnp.zeros((), jnp.int32) for _ in range(a.ndim - 2))
        outs.append(jax.lax.dynamic_slice(
            a, starts, (a.shape[0], Lk) + a.shape[2:]))
    return outs[0] if len(outs) == 1 else tuple(outs)
