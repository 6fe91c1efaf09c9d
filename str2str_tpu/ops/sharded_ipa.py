"""Sequence-sharded IPA attention over a device mesh (long-context path).

The reference caps sequence length by filtering/truncation because its IPA
materializes O(L^2) tensors on one device (SURVEY §5.7; reference
ipa.py:183-258, configs/data/protein.yaml max_len 500). This op shards the
KEY axis of IPA attention over the mesh's data axis with `shard_map`:

  * k/v/point-value tensors and the edge tensor's key dim live sharded
    (each device holds z[..., j_shard, :] — the O(L^2) memory is divided
    by the mesh size);
  * softmax runs exactly via a global max (pmax) + normalizer (psum);
  * all three output streams are partial sums over local keys, combined
    with one psum each — compiler-scheduled ICI collectives, the
    TPU-native equivalent of ring attention for this attention pattern.

Numerically exact w.r.t. the unsharded oracle (tests/test_sharded_ipa.py).
This provides the L >> 512 memory path; the surrounding trunk layers
(EdgeTransition, transitions) are pointwise over (i, j) and can run under
the same shard_map — wiring the full sharded trunk is tracked in NEXT.md.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from str2str_tpu.parallel.compat import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..parallel.mesh import DATA_AXIS


def sharded_ipa_attention(mesh: Mesh, q, k, v, q_pts, k_pts, v_pts, z,
                          kb, bb, kdz, bdz, head_weights, mask,
                          *, inf: float = 1e5, axis: str = DATA_AXIS):
    """Same contract as ops.ipa_attention.ipa_attention_reference, with the
    key axis of k/v/k_pts/v_pts/z/mask sharded over `axis` of `mesh`.
    Inputs may be given unsharded (B, L, ...) — shard_map partitions them —
    and outputs come back replicated (B, L, head-flattened)."""
    n_shards = mesh.shape[axis]
    B, L, HC = k.shape
    assert L % n_shards == 0, f"key length {L} not divisible by {n_shards}"
    H = head_weights.shape[0]
    C = HC // H
    Pq = q_pts.shape[-1] // (3 * H)
    Pv = v_pts.shape[-1] // (3 * H)
    dt = q.dtype

    scale_qk = math.sqrt(1.0 / (3 * C))
    pt_norm = math.sqrt(1.0 / (3 * (Pq * 9.0 / 2)))

    def local(q, k, v, q_pts, k_pts, v_pts, z, kb, bb, kdz, bdz, hw, mask):
        """Runs per device with k-side tensors holding the LOCAL key shard."""
        Lk = k.shape[1]

        def heads(t, p):
            return t.reshape(t.shape[0], t.shape[1], H, p)

        qh, kh, vh = heads(q, C), heads(k, C), heads(v, C)
        qf = heads(q_pts, 3 * Pq).astype(jnp.float32)
        kf = heads(k_pts, 3 * Pq).astype(jnp.float32)
        vfh = heads(v_pts, 3 * Pv)

        logits = jnp.einsum("bqhc,blhc->bhql", qh, kh,
                            precision=jax.lax.Precision.HIGHEST
                            ).astype(jnp.float32) * scale_qk
        bias = (jnp.einsum("bqlc,ch->bqlh", z, kb.astype(dt))
                .astype(jnp.float32) + bb)
        logits = logits + math.sqrt(1.0 / 3) * jnp.transpose(bias, (0, 3, 1, 2))
        cross = jnp.einsum("bqhp,blhp->bhql", qf, kf,
                           precision=jax.lax.Precision.HIGHEST)
        d2 = (jnp.sum(qf * qf, -1).transpose(0, 2, 1)[..., :, None]
              + jnp.sum(kf * kf, -1).transpose(0, 2, 1)[..., None, :]
              - 2 * cross)
        logits = logits - 0.5 * hw[None, :, None, None] * pt_norm * d2
        logits = logits + (inf * (mask.astype(jnp.float32) - 1.0))[:, None, None, :]

        # Exact softmax across shards: global max then global normalizer.
        local_max = jnp.max(logits, axis=-1, keepdims=True)
        gmax = jax.lax.pmax(local_max, axis)
        e = jnp.exp(logits - gmax)                      # (B, H, Lq, Lk)
        gsum = jax.lax.psum(jnp.sum(e, axis=-1, keepdims=True), axis)
        p = (e / gsum).astype(dt)

        pz = (jnp.einsum("bqlc,cd->bqld", z, kdz.astype(dt))
              .astype(jnp.float32) + bdz).astype(dt)

        o = jnp.einsum("bhql,blhc->bqhc", p, vh,
                       precision=jax.lax.Precision.HIGHEST)
        opt = jnp.einsum("bhql,blhp->bqhp", p, vfh,
                         precision=jax.lax.Precision.HIGHEST)
        opair = jnp.einsum("bhql,bqld->bqhd", p, pz,
                           precision=jax.lax.Precision.HIGHEST)
        # Partial sums over the local key shard -> one psum each.
        o = jax.lax.psum(o, axis)
        opt = jax.lax.psum(opt, axis)
        opair = jax.lax.psum(opair, axis)
        Lq = q.shape[1]
        return (o.reshape(B, Lq, H * C),
                opt.reshape(B, Lq, H * 3 * Pv),
                opair.reshape(B, Lq, -1))

    key_sharded = P(None, axis)
    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(), key_sharded, key_sharded,
                  P(), key_sharded, key_sharded,
                  P(None, None, axis), P(), P(), P(), P(), P(),
                  key_sharded),
        out_specs=(P(), P(), P()),
        check_rep=False)
    return fn(q, k, v, q_pts, k_pts, v_pts, z, kb, bb, kdz, bdz,
              head_weights, mask)
