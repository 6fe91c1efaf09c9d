"""Fused Invariant-Point-Attention as a Pallas TPU kernel.

One program handles a query block for all heads: it computes the pair bias
and down-projected pair values from the edge tensor tile *inside* the kernel
(z is read exactly once from HBM), forms the three logit contributions
(scalar qk, pair bias, squared point distances via the distance expansion),
does an fp32 softmax over full rows, and accumulates the three output streams
(scalar values, global-frame point values, pair values) in VMEM.

Replaces, per IPA block, the XLA path's HBM round-trips for: the [B,H,L,L]
attention tensor (write + 4 reads), a second read of z (linear_b and down_z),
and the bias/pair-value intermediates.

Frame application/inversion of the points and all the projections stay
outside (they are O(L) and fuse well in XLA). Inference-only: no VJP yet.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None


def is_supported() -> bool:
    if pltpu is None:
        return False
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def _kernel(q_ref, k_ref, v_ref, qf_ref, kf_ref, vf_ref, z_ref,
            kb_ref, bb_ref, kdz_ref, bdz_ref, hw_ref, mask_ref,
            o_ref, opt_ref, opair_ref,
            *, H: int, C: int, Pq: int, Pv: int, inf: float):
    """Shapes per program (Qb query rows, L keys):
    q: (1, Qb, H*C)   k/v: (1, L, H*C)
    qf: (1, Qb, H*3Pq) kf: (1, L, H*3Pq) vf: (1, L, H*3Pv)
    z: (1, Qb, L, Cz)
    kb: (Cz, H) bb: (1, H)  kdz: (Cz, Cdz) bdz: (1, Cdz)
    hw: (1, H) softplus'd head weights; mask: (1, 1, L)
    outputs: o (1, Qb, H*C), opt (1, Qb, H*3Pv), opair (1, Qb, H*Cdz)
    """
    Qb = q_ref.shape[1]
    L = k_ref.shape[1]
    Cz = z_ref.shape[-1]
    Cdz = kdz_ref.shape[1]
    dt = q_ref.dtype

    z2 = z_ref[0].reshape(Qb * L, Cz)
    # Pair bias for every head: (Qb*L, H), f32.
    bias = jnp.dot(z2, kb_ref[:], preferred_element_type=jnp.float32)
    bias = (bias + bb_ref[0]).reshape(Qb, L, H)
    # Down-projected pair values: (Qb, L, Cdz).
    pz = jnp.dot(z2, kdz_ref[:], preferred_element_type=jnp.float32)
    pz = (pz + bdz_ref[0]).reshape(Qb, L, Cdz).astype(dt)

    mask_bias = inf * (mask_ref[0, 0] - 1.0)  # (L,) 0 real, -inf-ish pad

    scale_qk = math.sqrt(1.0 / (3 * C))
    scale_b = math.sqrt(1.0 / 3)
    pt_norm = math.sqrt(1.0 / (3 * (Pq * 9.0 / 2)))

    for h in range(H):
        q_h = q_ref[0, :, h * C:(h + 1) * C]
        k_h = k_ref[0, :, h * C:(h + 1) * C]
        v_h = v_ref[0, :, h * C:(h + 1) * C]
        qf_h = qf_ref[0, :, h * 3 * Pq:(h + 1) * 3 * Pq].astype(jnp.float32)
        kf_h = kf_ref[0, :, h * 3 * Pq:(h + 1) * 3 * Pq].astype(jnp.float32)
        vf_h = vf_ref[0, :, h * 3 * Pv:(h + 1) * 3 * Pv]

        logits = scale_qk * jnp.dot(q_h, k_h.T, preferred_element_type=jnp.float32)
        logits = logits + scale_b * bias[:, :, h]

        cross = jnp.dot(qf_h, kf_h.T, preferred_element_type=jnp.float32)
        q_sq = jnp.sum(qf_h * qf_h, axis=-1)
        k_sq = jnp.sum(kf_h * kf_h, axis=-1)
        dist2 = q_sq[:, None] + k_sq[None, :] - 2.0 * cross
        logits = logits - 0.5 * hw_ref[0, h] * pt_norm * dist2
        logits = logits + mask_bias[None, :]

        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        p_f32 = e / jnp.sum(e, axis=-1, keepdims=True)
        p = p_f32.astype(dt)

        o_ref[0, :, h * C:(h + 1) * C] = jnp.dot(
            p, v_h, preferred_element_type=jnp.float32).astype(dt)
        opt_ref[0, :, h * 3 * Pv:(h + 1) * 3 * Pv] = jnp.dot(
            p, vf_h, preferred_element_type=jnp.float32).astype(dt)
        # o_pair[i, c] = sum_j p[i, j] * pz[i, j, c]  (per-row contraction).
        # Expand the minor dim on the f32 tensor: Mosaic only supports
        # non-no-op minor-dim insertion for 32-bit types.
        opair = jnp.sum(p_f32[:, :, None] * pz.astype(jnp.float32), axis=1)
        opair_ref[0, :, h * Cdz:(h + 1) * Cdz] = opair.astype(dt)


def ipa_attention_pallas(q, k, v, q_pts, k_pts, v_pts, z, kb, bb, kdz, bdz,
                         head_weights, mask, *, inf: float = 1e5,
                         query_block: int = 64):
    """
    q: (B, Qtot, H*C); k/v: (B, L, H*C); q_pts: (B, Qtot, H*3Pq) global
    coords; k_pts: (B, L, H*3Pq); v_pts: (B, L, H*3Pv); z: (B, Qtot, L, Cz);
    kb/bb: linear_b kernel/bias; kdz/bdz: down_z kernel/bias;
    head_weights: (H,) softplus-activated; mask: (B, L).
    Returns (o, o_pt_global, o_pair) with head-flattened channel layouts.
    """
    B, L, HC = k.shape
    Qtot = q.shape[1]
    Cz = z.shape[-1]
    H = head_weights.shape[0]
    C = HC // H
    Pq = q_pts.shape[-1] // (3 * H)
    Pv = v_pts.shape[-1] // (3 * H)
    Cdz = kdz.shape[1]

    # VMEM budget: shrink the query block until the working set fits; the
    # kernel holds full-L key/value blocks, so very large L falls back to XLA
    # (key-block streaming is future work). Mosaic materializes fp32 copies
    # of bf16 operands feeding fp32-accumulating dots, so intermediates are
    # costed at 4 bytes regardless of input dtype.
    s = jnp.dtype(q.dtype).itemsize
    fixed = 2 * (2 * L * H * C * s            # k, v (double-buffered)
                 + L * H * 3 * (Pq + Pv) * s)  # kf, vf
    budget = 13 * 1024 * 1024

    qb = None
    for cand in (min(query_block, 16), 8):
        if cand > Qtot or Qtot % cand:
            continue
        per_q = (2 * cand * L * Cz * s        # z tile (double-buffered)
                 + cand * L * Cz * 4          # fp32 upcast copy of the tile
                 + cand * L * (H + Cdz) * 4   # bias + pz intermediates
                 + cand * L * 4)              # logits
        if fixed + per_q <= budget:
            qb = cand
            break
    if qb is None:
        return ipa_attention_reference(
            q, k, v, q_pts, k_pts, v_pts, z, kb, bb, kdz, bdz,
            head_weights, mask, inf=inf)

    kern = functools.partial(_kernel, H=H, C=C, Pq=Pq, Pv=Pv, inf=inf)
    grid = (B, Qtot // qb)
    dt = q.dtype

    o, opt, opair = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, qb, H * C), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, L, H * C), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, L, H * C), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, qb, H * 3 * Pq), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, L, H * 3 * Pq), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, L, H * 3 * Pv), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, qb, L, Cz), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((Cz, H), lambda b, i: (0, 0)),
            pl.BlockSpec((1, H), lambda b, i: (0, 0)),
            pl.BlockSpec((Cz, Cdz), lambda b, i: (0, 0)),
            pl.BlockSpec((1, Cdz), lambda b, i: (0, 0)),
            pl.BlockSpec((1, H), lambda b, i: (0, 0)),
            pl.BlockSpec((1, 1, L), lambda b, i: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, qb, H * C), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, qb, H * 3 * Pv), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, qb, H * Cdz), lambda b, i: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Qtot, H * C), dt),
            jax.ShapeDtypeStruct((B, Qtot, H * 3 * Pv), dt),
            jax.ShapeDtypeStruct((B, Qtot, H * Cdz), dt),
        ],
    )(q, k, v, q_pts, k_pts, v_pts, z,
      kb.astype(dt), bb.reshape(1, -1).astype(jnp.float32),
      kdz.astype(dt), bdz.reshape(1, -1).astype(jnp.float32),
      head_weights.reshape(1, -1).astype(jnp.float32),
      mask.astype(jnp.float32).reshape(B, 1, L))
    return o, opt, opair


def ipa_attention_reference(q, k, v, q_pts, k_pts, v_pts, z, kb, bb, kdz, bdz,
                            head_weights, mask, *, inf: float = 1e5,
                            query_block: int = 64):
    """Plain-XLA oracle with identical inputs/outputs."""
    B, L, HC = k.shape
    H = head_weights.shape[0]
    C = HC // H
    Pq = q_pts.shape[-1] // (3 * H)
    Pv = v_pts.shape[-1] // (3 * H)
    dt = q.dtype

    bias = (jnp.einsum("bqlc,ch->bqlh", z, kb.astype(dt)).astype(jnp.float32)
            + bb)
    pz = jnp.einsum("bqlc,cd->bqld", z, kdz.astype(dt)).astype(jnp.float32) + bdz

    def heads(t, p):
        return t.reshape(B, t.shape[1], H, p)

    qh, kh, vh = heads(q, C), heads(k, C), heads(v, C)
    qfh, kfh = heads(q_pts, 3 * Pq), heads(k_pts, 3 * Pq)
    vfh = heads(v_pts, 3 * Pv)

    logits = jnp.einsum("bqhc,blhc->bhql", qh, kh,
                        precision=jax.lax.Precision.HIGHEST).astype(jnp.float32)
    logits = logits * math.sqrt(1.0 / (3 * C))
    logits = logits + math.sqrt(1.0 / 3) * jnp.transpose(bias, (0, 3, 1, 2))
    qf = qfh.astype(jnp.float32)
    kf = kfh.astype(jnp.float32)
    cross = jnp.einsum("bqhp,blhp->bhql", qf, kf,
                       precision=jax.lax.Precision.HIGHEST)
    d2 = (jnp.sum(qf * qf, -1).transpose(0, 2, 1)[..., :, None]
          + jnp.sum(kf * kf, -1).transpose(0, 2, 1)[..., None, :] - 2 * cross)
    pt_norm = math.sqrt(1.0 / (3 * (Pq * 9.0 / 2)))
    logits = logits - 0.5 * head_weights[None, :, None, None] * pt_norm * d2
    logits = logits + (inf * (mask.astype(jnp.float32) - 1.0))[:, None, None, :]

    p = jax.nn.softmax(logits, axis=-1).astype(dt)
    o = jnp.einsum("bhql,blhc->bqhc", p, vh,
                   precision=jax.lax.Precision.HIGHEST).reshape(B, -1, H * C)
    opt = jnp.einsum("bhql,blhp->bqhp", p, vfh,
                     precision=jax.lax.Precision.HIGHEST).reshape(B, -1, H * 3 * Pv)
    opair = jnp.einsum("bhql,bqld->bqhd", p, pz.astype(dt),
                       precision=jax.lax.Precision.HIGHEST).reshape(
        B, -1, H * pz.shape[-1])
    return o, opt, opair
