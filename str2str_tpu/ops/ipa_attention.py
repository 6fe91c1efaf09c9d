"""Fused Invariant-Point-Attention as a Pallas TPU kernel (fwd + bwd).

Replaces, per IPA block, the XLA path's HBM round-trips for: the fp32
[B,H,L,L] logits tensor (written and re-read ~3x by the XLA path: qk, +bias,
+point-distance, softmax), the attention-weight tensor feeding three
separate aggregation einsums, and the associated fp32 upcasts. Inside the
kernel, logits/softmax/all three output streams live entirely in VMEM.

Division of labor (what made this fast where two earlier versions were not):

  * The z projections (pair bias `linear_b` and down-projected pair values
    `down_z`) are computed OUTSIDE the kernel by XLA, which fuses both into
    a single pass over z and can emit them in arbitrary layouts for free.
    Emitting them inside the kernel produces them with the head/channel
    dim in lanes, and any lane->sublane relayout (per-head lane selects or
    a transpose) costs more than the saved HBM traffic. The kernel consumes
      proj  (B, L, Cdz+H, L) — fused [down_z | sqrt(1/3)*bias] projection
    with the channel dim on a MAJOR axis so both per-head bias and the pz
    block are free slices.
  * All per-head operands are head-major 4D blocks, so every per-head access
    is a major-axis index — no lane slicing, no in-kernel transposes.
  * The squared point-distance logits use the expansion
    |q-k|^2 = |q|^2 + |k|^2 - 2<q,k>; the cross term is FOLDED INTO the
    scalar-QK matmul by concatenating [scale_qk * q, sqrt(w_h*c_pt) * q_pts]
    per head, and the rank-1 corrections + mask ride two extra
    ones-columns/rows of the same matmul: ONE (Qb, D+2) x (D+2, L) dot per
    head yields the complete logits.
  * The k-side (k|k_pts, v, v_pts for the FULL length L) stays resident in
    VMEM across query blocks, so the softmax runs over complete rows — no
    online/flash rescaling pass is needed for L <= 512 (the reference trains
    at max_len 500; longer sequences fall back to the XLA path).
  * o_pair (the per-query attention-weighted pair values) is ONE batched
    MXU contraction over keys: (Qb, H, L) x (Qb, Cdz, L) -> (Qb, H, Cdz),
    batched over query rows.

Training: the custom_vjp boundary sits at the KERNEL CORE
(`_attn_core(qhat, khat, v4, vf4, proj)`), whose backward is a hand-written
Pallas kernel that recomputes the softmax in VMEM (storing nothing but the
kernel's own inputs), one (batch, head) per program with the full query
axis resident — see `_bwd_kernel`.
The XLA prep (head-major packing, folded scalings, the fused z projection)
stays ordinary differentiable JAX, so gradients w.r.t. q/k/v/points/z and
all projection weights fall out of autodiff of O(L)-sized code plus one
z-sized einsum VJP. No oracle forward runs inside the backward — this is
what makes fused-kernel TRAINING faster than the XLA path (round 2 it was
1.6x slower because the custom_vjp differentiated the whole XLA oracle).

Transposed-operand rule: every backward matmul is phrased in natural
(M,K)x(K,N), contract-dim1/dim1, or leading-batch form; the operand
transposes that requires (qhat^T, do^T, dopt^T) are built OUTSIDE by XLA
where relayouts are free, and handed to the kernel as extra inputs (they
are node-sized, ~10 MB total — noise next to the avoided [B,H,L,L]
materializations).

Reference semantics being reproduced: the [B,H,L,L] materialization of
/root/reference/src/models/net/ipa.py:183-258 and its autograd.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ._pallas_util import cp as _cp
from ._pallas_util import is_tpu as is_supported

# Test hook: force a query block size (bypasses the L>=128 VMEM picker so
# interpreter-mode CPU tests can exercise the real kernels at tiny L).
_FORCE_QB: int | None = None


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(qhat_ref, khat_ref, v_ref, vf_ref, proj_ref,
                o_ref, opt_ref, opair_ref, *, H: int, Cdz: int):
    """Shapes per program (Qb query rows, full-L keys):
    qhat: (1, H, Qb, D+2)  [D = C + 3*Pq: pre-scaled q | point-q | rank-1
                            |q|^2 correction | ones]
    khat: (1, H, D+2, L)   [pre-transposed: k | point-k | ones | per-key
                            correction + mask bias — so ONE (Qb,D+2)@(D+2,L)
                            dot per head yields the complete pre-bias logits]
    v:    (1, H, L, C)
    vf:   (1, H, 3*Pv, L)  [pre-transposed point values]
    proj: (1, Qb, Cdz+H, L) [ONE fused z projection: down-projected pair
                            values (first Cdz channels) | sqrt(1/3)-scaled
                            pair bias per head]
    outputs: o (1, Qb, H*C) — written per head at lane offset h*C (C is a
             lane multiple), so the consumer-side (B, Q, H*C) layout needs
             NO head-major->flat relayout copy (that copy measured
             ~0.2 ms/forward at B=50 L=128);
             opt (1, H, Qb, 3*Pv) head-major (3Pv = 36 lanes is not
             lane-aligned per head, so a flat layout would need unaligned
             stores); opair (1, Qb, H, Cdz) — reshape-free to (B, Q, H*Cdz).
    """
    dt = v_ref.dtype
    C = v_ref.shape[-1]

    ps = []
    for h in range(H):
        logits = jnp.dot(qhat_ref[0, h], khat_ref[0, h],
                         preferred_element_type=jnp.float32)  # (Qb, L)
        logits = logits + proj_ref[0][:, Cdz + h, :].astype(jnp.float32)

        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dt)
        ps.append(p)

        o_ref[0, :, h * C:(h + 1) * C] = jnp.dot(
            p, v_ref[0, h], preferred_element_type=jnp.float32).astype(dt)
        # o_pt: contract over keys against the pre-transposed (3Pv, L) block.
        opt_ref[0, h] = jax.lax.dot_general(
            p, vf_ref[0, h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dt)

    # o_pair[i, h, c] = sum_j p[h, i, j] * pz[i, c, j]: one batched MXU
    # contraction over keys, batched over query rows.
    p_all = jnp.stack(ps, axis=1)  # (Qb, H, L)
    opair_ref[0] = jax.lax.dot_general(
        p_all, proj_ref[0][:, :Cdz, :], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(dt)


def _fwd_kernel_nat(qs_ref, ks_ref, v_ref, qp_ref, kp_ref, vf_ref, proj_ref,
                    o_ref, opt_ref, opair_ref, *, H: int, Cdz: int):
    """Packed-natural variant of `_fwd_kernel`: the scalar q/k/v operands
    arrive in their NATURAL (rows, H*C) layout — in production all three are
    lane-block views of the SAME packed node-projection tensor (the model
    passes `packed` three times with different BlockSpec lane offsets), so
    XLA emits no slice/split/transpose for them at all. The logit scale
    sqrt(1/(3C)) is pre-folded into the q projection weights.

    Per-head scalar work uses aligned lane slices (C is a lane multiple):
      logits_h = qs[:, hC:(h+1)C] . ks[:, hC:(h+1)C]^T   (contract dim1/dim1)
      o[:, hC:(h+1)C] = p @ v[:, hC:(h+1)C]              (natural)
    The point-distance + rank-1 corrections + mask arrive as one small
    head-major pair qp (1,H,Qb,3Pq+2) / kp (1,H,3Pq+2,L) — the only
    remaining XLA prep is O(L)-sized point packing.
    Outputs exactly as `_fwd_kernel`.
    """
    dt = v_ref.dtype
    C = v_ref.shape[-1] // H

    ps = []
    for h in range(H):
        sl = slice(h * C, (h + 1) * C)
        logits = jax.lax.dot_general(
            qs_ref[0, :, sl], ks_ref[0, :, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)               # (Qb, L)
        logits = logits + jnp.dot(qp_ref[0, h], kp_ref[0, h],
                                  preferred_element_type=jnp.float32)
        logits = logits + proj_ref[0][:, Cdz + h, :].astype(jnp.float32)

        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dt)
        ps.append(p)

        o_ref[0, :, sl] = jnp.dot(
            p, v_ref[0, :, sl], preferred_element_type=jnp.float32).astype(dt)
        opt_ref[0, h] = jax.lax.dot_general(
            p, vf_ref[0, h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dt)

    p_all = jnp.stack(ps, axis=1)  # (Qb, H, L)
    opair_ref[0] = jax.lax.dot_general(
        p_all, proj_ref[0][:, :Cdz, :], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(dt)


def _fwd_kernel_partial(qhat_ref, khat_ref, v_ref, vf_ref, proj_ref,
                        o_ref, opt_ref, opair_ref, m_ref, s_ref,
                        *, H: int, Cdz: int):
    """Flash-style PARTIAL softmax over a LOCAL key shard (sequence-sharded
    trunk): same operands as `_fwd_kernel` with the key axis = this device's
    Lc columns, but the outputs are UNNORMALIZED exp-weighted sums plus the
    per-(head, query) row max `m` and exp-sum `s`. The exact cross-shard
    combine runs outside under shard_map:

        m_g = pmax(m);  w = exp(m - m_g)
        out = psum(out_unnorm * w) / psum(s * w)

    Outputs are fp32 (they are pre-normalization partial sums whose
    magnitude varies with the local max; normalizing happens after the
    collectives)."""
    dt = v_ref.dtype

    ps = []
    for h in range(H):
        logits = jnp.dot(qhat_ref[0, h], khat_ref[0, h],
                         preferred_element_type=jnp.float32)  # (Qb, Lc)
        logits = logits + proj_ref[0][:, Cdz + h, :].astype(jnp.float32)

        m = jnp.max(logits, axis=-1, keepdims=True)           # (Qb, 1)
        e = jnp.exp(logits - m)
        s = jnp.sum(e, axis=-1, keepdims=True)
        m_ref[0, h] = m
        s_ref[0, h] = s
        p = e.astype(dt)
        ps.append(p)

        o_ref[0, h] = jnp.dot(p, v_ref[0, h],
                              preferred_element_type=jnp.float32)
        opt_ref[0, h] = jax.lax.dot_general(
            p, vf_ref[0, h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    p_all = jnp.stack(ps, axis=1)  # (Qb, H, Lc)
    opair_ref[0] = jax.lax.dot_general(
        p_all, proj_ref[0][:, :Cdz, :], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(qhat_ref, qhatT_ref, khat_ref, v_ref, vf_ref,
                biasT_ref, dp_pair_ref,
                do_ref, doT_ref, dopt_ref, doptT_ref,
                dqhat_ref, dkhat_ref, dvT_ref, dvf_ref, p_ref, dl_ref,
                *, H: int, Cdz: int):
    """Recompute-softmax backward, one (batch row, head) per program with
    the FULL query axis resident — no cross-program accumulators, and every
    operand block's trailing two dims are full array dims (the Mosaic
    block-shape constraint rules out qb-wide trailing dims).

    XLA-side prep supplies the operand transposes (qhatT, doT, doptT — so
    every matmul is natural (M,K)x(K,N) or contract-dim1/dim1), the
    per-head bias slice biasT (B,H,Q,L), and the o_pair dp-contribution
    dp_pair[b,h,q,l] = sum_c dopair[b,q,h,c]*pz[b,q,c,l].

    The kernel also emits the attention weights p and logit-cotangents dl
    (both (B,H,Q,L), value dtype); XLA assembles dproj from them (dpz via
    one einsum with dopair + the bias rows) — cheaper than carrying the
    (Q, Cdz+H, L) assembly in VMEM.
    """
    dt = v_ref.dtype

    logits = jnp.dot(qhat_ref[0, 0], khat_ref[0, 0],
                     preferred_element_type=jnp.float32)      # (Q, L)
    logits = logits + biasT_ref[0, 0].astype(jnp.float32)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    pf = e / jnp.sum(e, axis=-1, keepdims=True)               # (Q, L) f32
    p = pf.astype(dt)
    p_ref[0, 0] = p

    # dp = do @ v^T + dopt @ vf + dp_pair
    dp = jax.lax.dot_general(
        do_ref[0, 0], v_ref[0, 0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                   # (Q,C)x(L,C)
    dp = dp + jnp.dot(dopt_ref[0, 0], vf_ref[0, 0],
                      preferred_element_type=jnp.float32)
    dp = dp + dp_pair_ref[0, 0].astype(jnp.float32)

    # softmax VJP
    dl = pf * (dp - jnp.sum(dp * pf, axis=-1, keepdims=True))
    dlc = dl.astype(dt)
    dl_ref[0, 0] = dlc

    # dqhat = dl @ khat^T  : (Q,L)x(D2,L) contract-1/1 -> (Q,D2)
    dqhat_ref[0, 0] = jax.lax.dot_general(
        dlc, khat_ref[0, 0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dqhat_ref.dtype)
    # dkhat = qhat^T @ dl : (D2,Q)x(Q,L) natural
    dkhat_ref[0, 0] = jnp.dot(qhatT_ref[0, 0], dlc,
                              preferred_element_type=jnp.float32
                              ).astype(dkhat_ref.dtype)
    # dv^T = do^T @ p     : (C,Q)x(Q,L) natural
    dvT_ref[0, 0] = jnp.dot(doT_ref[0, 0], p,
                            preferred_element_type=jnp.float32
                            ).astype(dvT_ref.dtype)
    # dvf = dopt^T @ p    : (3Pv,Q)x(Q,L) natural
    dvf_ref[0, 0] = jnp.dot(doptT_ref[0, 0], p,
                            preferred_element_type=jnp.float32
                            ).astype(dvf_ref.dtype)


# ---------------------------------------------------------------------------
# block pickers (VMEM budgeting)
# ---------------------------------------------------------------------------

def _pick_query_block(Qtot: int, L: int, H: int, C: int, Pq: int, Pv: int,
                      Cdz: int, itemsize: int):
    """Largest query block whose forward VMEM working set fits."""
    if _FORCE_QB is not None:
        return _FORCE_QB
    D2 = C + 3 * Pq + 2
    lanes = 128
    if L < 128:
        # Sub-tile lane widths are NOT safe: the round-5 attempt to admit
        # L=64 (legal-looking full-dim lane blocks) miscompiled on the real
        # chip — silent parity error at B=50/L=64 plus a Mosaic
        # "unsupported shape cast" failure in the full net
        # (scripts/bench_l64_kernels.py). XLA path below one lane tile; the
        # L=64 eval bucket is carried by the chained-sampler overhead fixes.
        return None

    def pad(n):  # lane padding of a trailing dim
        return -(-n // lanes) * lanes

    Lp = pad(L)  # L is a LANE dim in khat/vf/proj: physically lane-padded
    fixed = 2 * (H * D2 * Lp          # khat (lanes = L)
                 + H * Lp * C         # v
                 + H * (3 * Pv + 8) * Lp  # vf, sublane-padded
                 ) * itemsize
    budget = 15 * 1024 * 1024
    for qb in (128, 64, 32, 16, 8):
        if qb > Qtot or Qtot % qb:
            continue
        per_q = (2 * qb * (Cdz + H) * Lp * itemsize  # fused projection tile
                 + 2 * qb * pad(D2) * H * itemsize   # qhat
                 + qb * H * Lp * itemsize            # stacked attn weights
                 + 2 * qb * (C + pad(3 * Pv) + pad(Cdz)) * H * itemsize  # outs
                 + 6 * qb * Lp * 4)                  # logits/exp f32 temps
        if fixed + per_q <= budget:
            return qb
    return None


def _bwd_supported(Qtot: int, L: int, H: int, C: int, Pq: int, Pv: int,
                   Cdz: int, itemsize: int) -> bool:
    """Backward VMEM check for the (batch, head) grid: per program the full
    (Q, L) attention plane plus all per-head operands must fit."""
    if _FORCE_QB is not None:
        return True
    if L < 128:
        return False
    D2 = C + 3 * Pq + 2
    per = (2 * (Qtot * D2 + D2 * Qtot + D2 * L + L * C + (3 * Pv + 8) * L
                + 2 * Qtot * L                       # biasT + dp_pair in
                + 2 * Qtot * (C + 3 * Pv + 16)       # do/doT/dopt/doptT
                ) * itemsize
           + (Qtot * D2 + D2 * L + C * L + (3 * Pv + 8) * L) * 4 * 2  # outs
           + 2 * Qtot * L * itemsize * 2             # p/dl outs
           + 5 * Qtot * L * 4)                       # f32 temps
    return per <= 14 * 1024 * 1024


# ---------------------------------------------------------------------------
# prep: head-major packing + folded scalings + fused z projection (XLA side,
# ordinary differentiable JAX — its autodiff is the grad path for q/k/v/
# points/z and the projection weights)
# ---------------------------------------------------------------------------

def _prep_qk(q, k, v, q_pts, k_pts, v_pts, head_weights, mask, inf: float):
    """Head-major packing + folded scalings for the q/k/v operands
    (everything except the z projection)."""
    B, L, HC = k.shape
    Qtot = q.shape[1]
    H = head_weights.shape[0]
    C = HC // H
    Pq = q_pts.shape[-1] // (3 * H)
    Pv = v_pts.shape[-1] // (3 * H)
    dt = q.dtype

    scale_qk = math.sqrt(1.0 / (3 * C))
    pt_norm = math.sqrt(1.0 / (3 * (Pq * 9.0 / 2)))
    w = head_weights.astype(jnp.float32) * pt_norm       # (H,)
    s_h = jnp.sqrt(w)                                     # fold into q/k pts

    def heads(t, p):  # (B, N, H*p) -> (B, H, N, p)
        return t.reshape(B, t.shape[1], H, p).transpose(0, 2, 1, 3)

    qh = heads(q, C)
    qf = heads(q_pts, 3 * Pq).astype(jnp.float32)
    kf = heads(k_pts, 3 * Pq).astype(jnp.float32)

    # Rank-1 distance corrections and mask, folded into the contraction as
    # two extra columns/rows: [.. | qcorr | 1] @ [.. ; 1 ; kadd].
    qcorr = -0.5 * w[None, :, None] * jnp.sum(qf * qf, axis=-1)  # (B, H, Qtot)
    kcorr = -0.5 * w[None, :, None] * jnp.sum(kf * kf, axis=-1)  # (B, H, L)
    kadd = kcorr + (inf * (mask.astype(jnp.float32) - 1.0))[:, None, :]

    # Cast every piece to the compute dtype BEFORE concatenating, so XLA
    # assembles the (D+2)-wide operands without fp32 intermediates (halves
    # the prep traffic at bf16).
    ones_q = jnp.ones((B, H, Qtot, 1), dt)
    qhat = jnp.concatenate(
        [(qh.astype(jnp.float32) * scale_qk).astype(dt),
         (qf * s_h[:, None, None]).astype(dt),
         qcorr[..., None].astype(dt), ones_q],
        axis=-1)                                          # (B, H, Qtot, D+2)
    ones_k = jnp.ones((B, H, 1, L), dt)
    khat = jnp.concatenate(
        [jnp.concatenate(
            [heads(k, C).astype(dt),
             (kf * s_h[:, None, None]).astype(dt)],
            axis=-1).transpose(0, 1, 3, 2),
         ones_k, kadd[:, :, None, :].astype(dt)],
        axis=2)                                           # (B, H, D+2, L)
    v4 = heads(v, C).astype(dt)                           # (B, H, L, C)
    vf4 = heads(v_pts, 3 * Pv).transpose(0, 1, 3, 2).astype(dt)  # (B,H,3Pv,L)
    return qhat, khat, v4, vf4


def _prep_pts(q_pts, k_pts, v_pts, head_weights, mask, inf: float, H: int,
              dt):
    """Point-side operands for the packed-natural kernel: the per-head
    sqrt(w_h·c_pt)-scaled point coords plus the rank-1 |q|²/|k|² distance
    corrections and the additive mask, packed head-major (they are the only
    operands that still need XLA-side packing — O(L)-sized).
    Returns qp (B,H,Q,3Pq+2), kp (B,H,3Pq+2,L), vf4 (B,H,3Pv,L)."""
    B, L, _ = k_pts.shape
    Qtot = q_pts.shape[1]
    Pq = q_pts.shape[-1] // (3 * H)
    Pv = v_pts.shape[-1] // (3 * H)
    pt_norm = math.sqrt(1.0 / (3 * (Pq * 9.0 / 2)))
    w = head_weights.astype(jnp.float32) * pt_norm        # (H,)
    s_h = jnp.sqrt(w)

    def heads(t, p):  # (B, N, H*p) -> (B, H, N, p)
        return t.reshape(B, t.shape[1], H, p).transpose(0, 2, 1, 3)

    qf = heads(q_pts, 3 * Pq).astype(jnp.float32)
    kf = heads(k_pts, 3 * Pq).astype(jnp.float32)
    qcorr = -0.5 * w[None, :, None] * jnp.sum(qf * qf, axis=-1)
    kcorr = -0.5 * w[None, :, None] * jnp.sum(kf * kf, axis=-1)
    kadd = kcorr + (inf * (mask.astype(jnp.float32) - 1.0))[:, None, :]

    ones_q = jnp.ones((B, H, Qtot, 1), dt)
    qp = jnp.concatenate(
        [(qf * s_h[:, None, None]).astype(dt),
         qcorr[..., None].astype(dt), ones_q], axis=-1)
    ones_k = jnp.ones((B, H, 1, L), dt)
    kp = jnp.concatenate(
        [(kf * s_h[:, None, None]).astype(dt).transpose(0, 1, 3, 2),
         ones_k, kadd[:, :, None, :].astype(dt)], axis=2)
    vf4 = heads(v_pts, 3 * Pv).transpose(0, 1, 3, 2).astype(dt)
    return qp, kp, vf4


def _nat_to_core_ops(packed, qp, kp, H: int, C: int):
    """Rebuild the head-major core operands (qhat, khat, v4) from the
    packed-natural ones — used by the nat path's CPU/fallback forward and
    by its backward (which reuses `_core_bwd_call` / `_core_reference`
    unchanged; the extra transposes are training-only cost)."""
    B, Qtot, _ = packed.shape
    HC = H * C

    def heads(t):  # (B, N, H*C) -> (B, H, N, C)
        return t.reshape(B, t.shape[1], H, C).transpose(0, 2, 1, 3)

    qs = heads(packed[..., :HC])
    ks = heads(packed[..., HC:2 * HC])
    v4 = heads(packed[..., 2 * HC:3 * HC])
    qhat = jnp.concatenate([qs, qp], axis=-1)               # (B,H,Q,D2)
    khat = jnp.concatenate([ks.transpose(0, 1, 3, 2), kp], axis=2)
    return qhat, khat, v4


def fold_proj_weights(kb, bb, kdz, bdz):
    """Fused [down_z | sqrt(1/3)*linear_b] projection weights.
    Returns wcat (Cz, Cdz+H) and bcat (Cdz+H,) in fp32."""
    wcat = jnp.concatenate(
        [kdz.astype(jnp.float32),
         kb.astype(jnp.float32) * math.sqrt(1.0 / 3)], axis=1)
    bcat = jnp.concatenate(
        [bdz.astype(jnp.float32),
         bb.astype(jnp.float32) * math.sqrt(1.0 / 3)])
    return wcat, bcat


def make_proj(z, kb, bb, kdz, bdz, dt):
    """Edge projections: ONE fused XLA pass over z (single z read), emitted
    directly in the layout the kernel consumes — channel dim on a MAJOR
    axis (free for XLA's copy epilogue, prohibitive to produce in-kernel).
    Returns (B, Qtot, Cdz+H, L) in dt. When the producing EdgeTransition
    runs its fused kernel, the kernel emits this tensor itself
    (ops/edge_mlp.py) and this XLA pass — a full z read — is skipped."""
    wcat, bcat = fold_proj_weights(kb, bb, kdz, bdz)
    return (jnp.einsum("bqlc,cx->bqxl", z, wcat.astype(dt)).astype(jnp.float32)
            + bcat[None, None, :, None]).astype(dt)


def _prep(q, k, v, q_pts, k_pts, v_pts, z, kb, bb, kdz, bdz,
          head_weights, mask, inf: float):
    qhat, khat, v4, vf4 = _prep_qk(q, k, v, q_pts, k_pts, v_pts,
                                   head_weights, mask, inf)
    proj = make_proj(z, kb, bb, kdz, bdz, q.dtype)
    return qhat, khat, v4, vf4, proj


# ---------------------------------------------------------------------------
# kernel core with hand-written VJP
# ---------------------------------------------------------------------------

def _core_shapes(qhat, khat, v4, vf4, proj):
    B, H, Qtot, D2 = qhat.shape
    L = khat.shape[-1]
    C = v4.shape[-1]
    Pv3 = vf4.shape[2]
    Cdz = proj.shape[2] - H
    Pq = (D2 - 2 - C) // 3
    return B, H, Qtot, D2, L, C, Pv3, Cdz, Pq


def _core_fwd_call(qhat, khat, v4, vf4, proj, qb: int):
    B, H, Qtot, D2, L, C, Pv3, Cdz, _ = _core_shapes(qhat, khat, v4, vf4, proj)
    dt = v4.dtype
    kern = functools.partial(_fwd_kernel, H=H, Cdz=Cdz)
    return pl.pallas_call(
        kern,
        compiler_params=_cp(32 * 1024 * 1024),
        grid=(B, Qtot // qb),
        in_specs=[
            pl.BlockSpec((1, H, qb, D2), lambda b, i: (b, 0, i, 0)),
            pl.BlockSpec((1, H, D2, L), lambda b, i: (b, 0, 0, 0)),
            pl.BlockSpec((1, H, L, C), lambda b, i: (b, 0, 0, 0)),
            pl.BlockSpec((1, H, Pv3, L), lambda b, i: (b, 0, 0, 0)),
            pl.BlockSpec((1, qb, Cdz + H, L), lambda b, i: (b, i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, qb, H * C), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, H, qb, Pv3), lambda b, i: (b, 0, i, 0)),
            pl.BlockSpec((1, qb, H, Cdz), lambda b, i: (b, i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Qtot, H * C), dt),
            jax.ShapeDtypeStruct((B, H, Qtot, Pv3), dt),
            jax.ShapeDtypeStruct((B, Qtot, H, Cdz), dt),
        ],
    )(qhat, khat, v4, vf4, proj)


def _core_bwd_call(qhat, khat, v4, vf4, proj, do, dopt, dopair):
    B, H, Qtot, D2, L, C, Pv3, Cdz, _ = _core_shapes(qhat, khat, v4, vf4, proj)
    dt = v4.dtype
    # XLA-side prep (cheap next to the avoided [B,H,L,L] materializations):
    # operand transposes so every in-kernel matmul is Mosaic-fast, the
    # per-head bias planes, and the o_pair contribution to dp.
    # do arrives flat (B, Q, H*C) — the forward's consumer layout; the
    # head-major relayout moves to this backward (the forward is the path
    # the sampler runs ~500x per conformation).
    qhatT = qhat.transpose(0, 1, 3, 2)
    doc = do.reshape(B, Qtot, H, C).transpose(0, 2, 1, 3).astype(dt)
    doT = doc.transpose(0, 1, 3, 2)
    doptc = dopt.astype(dt)
    doptT = doptc.transpose(0, 1, 3, 2)
    biasT = proj[:, :, Cdz:, :].transpose(0, 2, 1, 3)       # (B, H, Q, L)
    pz = proj[:, :, :Cdz, :]
    dopc = dopair.astype(dt)
    dp_pair = jnp.einsum("bqhc,bqcl->bhql", dopc, pz,
                         preferred_element_type=jnp.float32).astype(dt)

    kern = functools.partial(_bwd_kernel, H=H, Cdz=Cdz)
    f32 = jnp.float32
    dqhat, dkhat, dvT, dvf, p_all, dl_all = pl.pallas_call(
        kern,
        compiler_params=_cp(64 * 1024 * 1024),
        grid=(B, H),
        in_specs=[
            pl.BlockSpec((1, 1, Qtot, D2), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, D2, Qtot), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, D2, L), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, L, C), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, Pv3, L), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, Qtot, L), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, Qtot, L), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, Qtot, C), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, C, Qtot), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, Qtot, Pv3), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, Pv3, Qtot), lambda b, h: (b, h, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, Qtot, D2), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, D2, L), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, C, L), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, Pv3, L), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, Qtot, L), lambda b, h: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, Qtot, L), lambda b, h: (b, h, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Qtot, D2), f32),   # dqhat
            jax.ShapeDtypeStruct((B, H, D2, L), f32),      # dkhat
            jax.ShapeDtypeStruct((B, H, C, L), f32),       # dv^T
            jax.ShapeDtypeStruct((B, H, Pv3, L), f32),     # dvf
            jax.ShapeDtypeStruct((B, H, Qtot, L), dt),     # p
            jax.ShapeDtypeStruct((B, H, Qtot, L), dt),     # dl
        ],
    )(qhat, qhatT, khat, v4, vf4, biasT, dp_pair,
      doc, doT, doptc, doptT)

    # dproj assembly (XLA): pz rows from p, bias rows = dl. Assembled in the
    # value dtype — the f32->dt casts fuse into the einsum/concat epilogues,
    # halving the assembly's HBM bytes (dl is already dt; dpz is an 8-term
    # (over heads) contraction whose bf16 rounding is within the cotangent's
    # own precision).
    dpz = jnp.einsum("bqhc,bhql->bqcl", dopc, p_all,
                     preferred_element_type=jnp.float32).astype(dt)
    dproj = jnp.concatenate(
        [dpz, dl_all.transpose(0, 2, 1, 3)], axis=2)
    return dqhat, dkhat, dvT, dvf, dproj


def _core_reference(qhat, khat, v4, vf4, proj):
    """XLA oracle operating on the prepped operands (fallback when the
    backward working set does not fit VMEM). o is emitted flat
    (B, Q, H*C) to match the kernel's output contract."""
    B, H, Qtot, D2, L, C, Pv3, Cdz, _ = _core_shapes(qhat, khat, v4, vf4, proj)
    dt = v4.dtype
    logits = jnp.einsum("bhqd,bhdl->bhql", qhat, khat,
                        preferred_element_type=jnp.float32)
    bias = proj[:, :, Cdz:, :].astype(jnp.float32)        # (B, Q, H, L)
    logits = logits + bias.transpose(0, 2, 1, 3)
    p = jax.nn.softmax(logits, axis=-1).astype(dt)
    o = jnp.einsum("bhql,bhlc->bqhc", p, v4,
                   preferred_element_type=jnp.float32).astype(dt)
    o = o.reshape(B, Qtot, H * C)
    opt = jnp.einsum("bhql,bhpl->bhqp", p, vf4,
                     preferred_element_type=jnp.float32).astype(dt)
    pz = proj[:, :, :Cdz, :]
    opair = jnp.einsum("bhql,bqcl->bqhc", p, pz,
                       preferred_element_type=jnp.float32).astype(dt)
    return o, opt, opair


def _partial_core_call(qhat, khat, v4, vf4, proj, qb: int):
    B, H, Qtot, D2, L, C, Pv3, Cdz, _ = _core_shapes(qhat, khat, v4, vf4, proj)
    f32 = jnp.float32
    kern = functools.partial(_fwd_kernel_partial, H=H, Cdz=Cdz)
    return pl.pallas_call(
        kern,
        compiler_params=_cp(32 * 1024 * 1024),
        grid=(B, Qtot // qb),
        in_specs=[
            pl.BlockSpec((1, H, qb, D2), lambda b, i: (b, 0, i, 0)),
            pl.BlockSpec((1, H, D2, L), lambda b, i: (b, 0, 0, 0)),
            pl.BlockSpec((1, H, L, C), lambda b, i: (b, 0, 0, 0)),
            pl.BlockSpec((1, H, Pv3, L), lambda b, i: (b, 0, 0, 0)),
            pl.BlockSpec((1, qb, Cdz + H, L), lambda b, i: (b, i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, H, qb, C), lambda b, i: (b, 0, i, 0)),
            pl.BlockSpec((1, H, qb, Pv3), lambda b, i: (b, 0, i, 0)),
            pl.BlockSpec((1, qb, H, Cdz), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, H, qb, 1), lambda b, i: (b, 0, i, 0)),
            pl.BlockSpec((1, H, qb, 1), lambda b, i: (b, 0, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Qtot, C), f32),
            jax.ShapeDtypeStruct((B, H, Qtot, Pv3), f32),
            jax.ShapeDtypeStruct((B, Qtot, H, Cdz), f32),
            jax.ShapeDtypeStruct((B, H, Qtot, 1), f32),
            jax.ShapeDtypeStruct((B, H, Qtot, 1), f32),
        ],
    )(qhat, khat, v4, vf4, proj)


def _partial_core_reference(qhat, khat, v4, vf4, proj):
    """XLA oracle for the partial-softmax core (CPU fallback and the
    custom_vjp backward — the sharded path is inference-first; training
    through it differentiates this oracle)."""
    B, H, Qtot, D2, L, C, Pv3, Cdz, _ = _core_shapes(qhat, khat, v4, vf4, proj)
    dt = v4.dtype
    logits = jnp.einsum("bhqd,bhdl->bhql", qhat, khat,
                        preferred_element_type=jnp.float32)
    bias = proj[:, :, Cdz:, :].astype(jnp.float32)
    logits = logits + bias.transpose(0, 2, 1, 3)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    p = e.astype(dt)
    o = jnp.einsum("bhql,bhlc->bhqc", p, v4,
                   preferred_element_type=jnp.float32)
    opt = jnp.einsum("bhql,bhpl->bhqp", p, vf4,
                     preferred_element_type=jnp.float32)
    pz = proj[:, :, :Cdz, :]
    opair = jnp.einsum("bhql,bqcl->bqhc", p, pz,
                       preferred_element_type=jnp.float32)
    return o, opt, opair, m, s


@jax.custom_vjp
def _attn_core_partial(qhat, khat, v4, vf4, proj):
    B, H, Qtot, D2, L, C, Pv3, Cdz, Pq = _core_shapes(qhat, khat, v4, vf4, proj)
    qb = _pick_query_block(Qtot, L, H, C, Pq, Pv3 // 3, Cdz,
                           jnp.dtype(v4.dtype).itemsize)
    # _FORCE_QB overrides the platform gate (interpret-mode tests run the
    # real partial kernel on CPU); production off-TPU uses the oracle.
    if qb is None or (_FORCE_QB is None and not is_supported()):
        return _partial_core_reference(qhat, khat, v4, vf4, proj)
    return _partial_core_call(qhat, khat, v4, vf4, proj, qb)


def _attn_core_partial_fwd(qhat, khat, v4, vf4, proj):
    return _attn_core_partial(qhat, khat, v4, vf4, proj), \
        (qhat, khat, v4, vf4, proj)


def _attn_core_partial_bwd(res, cts):
    _, vjp = jax.vjp(_partial_core_reference, *res)
    return vjp(cts)


_attn_core_partial.defvjp(_attn_core_partial_fwd, _attn_core_partial_bwd)


def ipa_attention_partial(q, k, v, q_pts, k_pts, v_pts, z, kb, bb, kdz, bdz,
                          head_weights, mask, *, inf: float = 1e5):
    """Fused IPA attention over a LOCAL key shard with partial softmax.

    Same contract as `ipa_attention` except k/v/k_pts/v_pts/mask hold this
    device's key shard (length Lc) and z the local (B, Qtot, Lc, Cz) column
    shard. Returns head-major UNNORMALIZED fp32 partials
    (o (B,H,Q,C), opt (B,H,Q,3Pv), opair (B,Q,H,Cdz), m (B,H,Q,1),
    s (B,H,Q,1)); the caller performs the exact cross-shard combine

        m_g = pmax(m); w = exp(m - m_g)
        out = psum(out * w-broadcast) / psum(s * w)

    under shard_map (see model/ipa.py seq_axis branch).
    """
    qhat, khat, v4, vf4, proj = _prep(
        q, k, v, q_pts, k_pts, v_pts, z, kb, bb, kdz, bdz,
        head_weights, mask, inf)
    return _attn_core_partial(qhat, khat, v4, vf4, proj)


def ipa_attention_partial_with_proj(q, k, v, q_pts, k_pts, v_pts, proj,
                                    head_weights, mask, *, inf: float = 1e5):
    """`ipa_attention_partial` consuming a PRECOMPUTED local fused z
    projection (B, Qtot, Cdz+H, Lc) — emitted per shard by the previous
    block's rectangular EdgeTransition kernel (sharded edge-stack
    mega-fusion; the local z column shard is never read here)."""
    qhat, khat, v4, vf4 = _prep_qk(q, k, v, q_pts, k_pts, v_pts,
                                   head_weights, mask, inf)
    return _attn_core_partial(qhat, khat, v4, vf4, proj)


@jax.custom_vjp
def _attn_core(qhat, khat, v4, vf4, proj):
    B, H, Qtot, D2, L, C, Pv3, Cdz, Pq = _core_shapes(qhat, khat, v4, vf4, proj)
    qb = _pick_query_block(Qtot, L, H, C, Pq, Pv3 // 3, Cdz,
                           jnp.dtype(v4.dtype).itemsize)
    # Same off-TPU gate as _attn_core_partial: a forced "on" on a CPU/GPU
    # host falls back to the oracle instead of failing at Mosaic lowering.
    # The _FORCE_QB test hook overrides the platform gate so interpret-mode
    # tests exercise the real kernel.
    if qb is None or (_FORCE_QB is None and not is_supported()):
        return _core_reference(qhat, khat, v4, vf4, proj)
    return _core_fwd_call(qhat, khat, v4, vf4, proj, qb)


def _attn_core_fwd(qhat, khat, v4, vf4, proj):
    return _attn_core(qhat, khat, v4, vf4, proj), (qhat, khat, v4, vf4, proj)


def _attn_core_bwd(res, cts):
    qhat, khat, v4, vf4, proj = res
    do, dopt, dopair = cts
    B, H, Qtot, D2, L, C, Pv3, Cdz, Pq = _core_shapes(qhat, khat, v4, vf4, proj)
    if not _bwd_supported(Qtot, L, H, C, Pq, Pv3 // 3, Cdz,
                          jnp.dtype(v4.dtype).itemsize):
        _, vjp = jax.vjp(_core_reference, qhat, khat, v4, vf4, proj)
        return vjp(cts)
    dqhat, dkhat, dvT, dvf, dproj = _core_bwd_call(
        qhat, khat, v4, vf4, proj, do, dopt, dopair)
    return (dqhat.astype(qhat.dtype), dkhat.astype(khat.dtype),
            dvT.transpose(0, 1, 3, 2).astype(v4.dtype),
            dvf.astype(vf4.dtype), dproj.astype(proj.dtype))


_attn_core.defvjp(_attn_core_fwd, _attn_core_bwd)


def _core_fwd_call_nat(packed, qp, kp, vf4, proj, qb: int, C: int):
    """Forward pallas_call for the packed-natural kernel. `packed` is handed
    in THREE times with different lane-block offsets — q at lane block 0,
    k at block 1, v at block 2 (HC-wide blocks; the point lanes past 3HC are
    never touched) — so the kernel DMAs the scalar operands straight out of
    the node projection's output with zero XLA formatting."""
    B, Qtot, _ = packed.shape
    H = qp.shape[1]
    Dp = qp.shape[-1]
    L = kp.shape[-1]
    Pv3 = vf4.shape[2]
    Cdz = proj.shape[2] - H
    HC = H * C
    dt = packed.dtype
    kern = functools.partial(_fwd_kernel_nat, H=H, Cdz=Cdz)
    return pl.pallas_call(
        kern,
        compiler_params=_cp(32 * 1024 * 1024),
        grid=(B, Qtot // qb),
        in_specs=[
            pl.BlockSpec((1, qb, HC), lambda b, i: (b, i, 0)),    # q lanes
            pl.BlockSpec((1, L, HC), lambda b, i: (b, 0, 1)),     # k lanes
            pl.BlockSpec((1, L, HC), lambda b, i: (b, 0, 2)),     # v lanes
            pl.BlockSpec((1, H, qb, Dp), lambda b, i: (b, 0, i, 0)),
            pl.BlockSpec((1, H, Dp, L), lambda b, i: (b, 0, 0, 0)),
            pl.BlockSpec((1, H, Pv3, L), lambda b, i: (b, 0, 0, 0)),
            pl.BlockSpec((1, qb, Cdz + H, L), lambda b, i: (b, i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, qb, HC), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, H, qb, Pv3), lambda b, i: (b, 0, i, 0)),
            pl.BlockSpec((1, qb, H, Cdz), lambda b, i: (b, i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Qtot, HC), dt),
            jax.ShapeDtypeStruct((B, H, Qtot, Pv3), dt),
            jax.ShapeDtypeStruct((B, Qtot, H, Cdz), dt),
        ],
    )(packed, packed, packed, qp, kp, vf4, proj)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _attn_core_nat(C: int, packed, qp, kp, vf4, proj):
    B, Qtot, _ = packed.shape
    H = qp.shape[1]
    L = kp.shape[-1]
    Pv3 = vf4.shape[2]
    Cdz = proj.shape[2] - H
    Pq = (qp.shape[-1] - 2) // 3
    qb = _pick_query_block(Qtot, L, H, C, Pq, Pv3 // 3, Cdz,
                           jnp.dtype(packed.dtype).itemsize)
    if qb is None or (_FORCE_QB is None and not is_supported()):
        qhat, khat, v4 = _nat_to_core_ops(packed, qp, kp, H, C)
        return _core_reference(qhat, khat, v4, vf4, proj)
    return _core_fwd_call_nat(packed, qp, kp, vf4, proj, qb, C)


def _attn_core_nat_fwd(C: int, packed, qp, kp, vf4, proj):
    return (_attn_core_nat(C, packed, qp, kp, vf4, proj),
            (packed, qp, kp, vf4, proj))


def _attn_core_nat_bwd(C: int, res, cts):
    """Backward of the packed-natural core: rebuild the head-major operands
    in XLA (training-only transposes) and reuse the existing hand-written
    backward kernel, then scatter the gradients back into packed-lane
    layout (zeros over the point lanes — their grads flow through the
    separate frame-application path outside this vjp boundary)."""
    packed, qp, kp, vf4, proj = res
    do, dopt, dopair = cts
    B, Qtot, lanes = packed.shape
    H = qp.shape[1]
    HC = H * C
    Pq = (qp.shape[-1] - 2) // 3
    Pv3 = vf4.shape[2]
    Cdz = proj.shape[2] - H
    L = kp.shape[-1]
    qhat, khat, v4 = _nat_to_core_ops(packed, qp, kp, H, C)
    if not _bwd_supported(Qtot, L, H, C, Pq, Pv3 // 3, Cdz,
                          jnp.dtype(v4.dtype).itemsize):
        _, vjp = jax.vjp(_core_reference, qhat, khat, v4, vf4, proj)
        dqhat, dkhat, dv4, dvf, dproj = vjp(cts)
        dvT = dv4.transpose(0, 1, 3, 2)
    else:
        dqhat, dkhat, dvT, dvf, dproj = _core_bwd_call(
            qhat, khat, v4, vf4, proj, do, dopt, dopair)
    dt = packed.dtype
    dqs = _unheads(dqhat[..., :C])
    dqp = dqhat[..., C:]
    dks = _unheads(dkhat[:, :, :C, :].transpose(0, 1, 3, 2))
    dkp = dkhat[:, :, C:, :]
    dv = _unheads(dvT.transpose(0, 1, 3, 2))
    dpacked = jnp.concatenate(
        [dqs.astype(dt), dks.astype(dt), dv.astype(dt),
         jnp.zeros((B, Qtot, lanes - 3 * HC), dt)], axis=-1)
    return (dpacked, dqp.astype(qp.dtype), dkp.astype(kp.dtype),
            dvf.astype(vf4.dtype), dproj.astype(proj.dtype))


_attn_core_nat.defvjp(_attn_core_nat_fwd, _attn_core_nat_bwd)


# ---------------------------------------------------------------------------
# public entry points
# ---------------------------------------------------------------------------

def _unheads(t):  # (B, H, Qtot, p) -> (B, Qtot, H*p)
    B, H, Q, p = t.shape
    return t.transpose(0, 2, 1, 3).reshape(B, Q, H * p)


def ipa_attention(q, k, v, q_pts, k_pts, v_pts, z, kb, bb, kdz, bdz,
                  head_weights, mask, *, inf: float = 1e5):
    """Differentiable fused IPA attention.

    q: (B, Qtot, H*C); k/v: (B, L, H*C); q_pts: (B, Qtot, H*3Pq) global
    coords; k_pts: (B, L, H*3Pq); v_pts: (B, L, H*3Pv); z: (B, Qtot, L, Cz);
    kb/bb: linear_b kernel/bias; kdz/bdz: down_z kernel/bias;
    head_weights: (H,) softplus-activated; mask: (B, L).
    Returns (o, o_pt_global, o_pair) with head-flattened channel layouts.

    Forward AND backward run hand-written Pallas kernels; gradients for the
    prep/packing flow through ordinary autodiff of `_prep`.
    """
    B, L, HC = k.shape
    Qtot = q.shape[1]
    H = head_weights.shape[0]
    C = HC // H
    Pq = q_pts.shape[-1] // (3 * H)
    Pv = v_pts.shape[-1] // (3 * H)
    Cdz = kdz.shape[1]
    dt = q.dtype

    qb = _pick_query_block(Qtot, L, H, C, Pq, Pv, Cdz, jnp.dtype(dt).itemsize)
    if qb is None:
        # Normalize the fallback to the kernel's output dtype so callers see
        # one contract either way.
        return tuple(t.astype(dt) for t in ipa_attention_reference(
            q, k, v, q_pts, k_pts, v_pts, z, kb, bb, kdz, bdz,
            head_weights, mask, inf=inf))

    qhat, khat, v4, vf4, proj = _prep(
        q, k, v, q_pts, k_pts, v_pts, z, kb, bb, kdz, bdz,
        head_weights, mask, inf)
    o, opt4, opair = _attn_core(qhat, khat, v4, vf4, proj)
    return o, _unheads(opt4), opair.reshape(B, Qtot, H * Cdz)


def ipa_attention_with_proj(q, k, v, q_pts, k_pts, v_pts, proj,
                            head_weights, mask, *, inf: float = 1e5):
    """Differentiable fused IPA attention consuming a PRECOMPUTED fused z
    projection (emitted by the previous block's EdgeTransition kernel while
    z was still in VMEM — the edge-stack mega-fusion path; z itself is
    never read here).

    proj: (B, Qtot, Cdz+H, L) = [down_z(z) | sqrt(1/3)*linear_b(z)] with the
    channel dim on a major axis. Other arguments as `ipa_attention`.
    """
    B, L, HC = k.shape
    Qtot = q.shape[1]
    H = head_weights.shape[0]
    C = HC // H
    Pq = q_pts.shape[-1] // (3 * H)
    Pv = v_pts.shape[-1] // (3 * H)
    Cdz = proj.shape[2] - H
    dt = q.dtype

    qhat, khat, v4, vf4 = _prep_qk(q, k, v, q_pts, k_pts, v_pts,
                                   head_weights, mask, inf)
    # _attn_core falls back to the XLA oracle on the prepped operands when
    # the kernel envelope does not fit (e.g. L < 128) — no z needed either
    # way.
    o, opt4, opair = _attn_core(qhat, khat, v4, vf4, proj.astype(dt))
    return o, _unheads(opt4), opair.reshape(B, Qtot, H * Cdz)


def ipa_attention_packed_with_proj(packed, q_pts, k_pts, v_pts, proj,
                                   head_weights, mask, *, c_hidden: int,
                                   inf: float = 1e5):
    """Differentiable fused IPA attention consuming the PACKED node
    projection directly (the production path; see `_fwd_kernel_nat`).

    packed: (B, L, >=3*H*C) — lane layout [q_scaled | k | v | ...ignored]
      where the q lanes carry the sqrt(1/(3C)) logit scale pre-folded into
      the projection weights and k/v lanes are head-contiguous (the model
      reorders the torch-layout kv weight columns at apply time; both folds
      are weight-sized ops on loop invariants, hoisted out of the anneal
      scan). The kernel DMAs its q/k/v blocks straight from this tensor —
      the per-block slice/split/relayout chain the old path paid (~1.2 ms
      per forward at B=50 L=128) does not exist here.
    q_pts/k_pts/v_pts: (B, L, H*3P) frame-applied global point coords.
    proj: (B, L, Cdz+H, L) fused z projection as in `ipa_attention_with_proj`.
    Returns (o, o_pt_global, o_pair) with head-flattened channel layouts.
    """
    H = head_weights.shape[0]
    C = c_hidden
    B, L, _ = packed.shape
    Cdz = proj.shape[2] - H
    qp, kp, vf4 = _prep_pts(q_pts, k_pts, v_pts, head_weights, mask, inf,
                            H, packed.dtype)
    o, opt4, opair = _attn_core_nat(C, packed, qp, kp, vf4,
                                    proj.astype(packed.dtype))
    return o, _unheads(opt4), opair.reshape(B, L, H * Cdz)


def ipa_attention_packed(packed, q_pts, k_pts, v_pts, z, kb, bb, kdz, bdz,
                         head_weights, mask, *, c_hidden: int,
                         inf: float = 1e5):
    """`ipa_attention_packed_with_proj` computing the fused z projection
    itself (one XLA pass over z — the non-mega-fusion entry)."""
    proj = make_proj(z, kb, bb, kdz, bdz, packed.dtype)
    return ipa_attention_packed_with_proj(
        packed, q_pts, k_pts, v_pts, proj, head_weights, mask,
        c_hidden=c_hidden, inf=inf)


def ipa_attention_pallas(q, k, v, q_pts, k_pts, v_pts, z, kb, bb, kdz, bdz,
                         head_weights, mask, *, inf: float = 1e5,
                         query_block: int | None = None):
    """Forward-only kernel entry (used by the microbench and kernel tests;
    `query_block` overrides the VMEM picker)."""
    B, L, HC = k.shape
    Qtot = q.shape[1]
    H = head_weights.shape[0]
    C = HC // H
    Pq = q_pts.shape[-1] // (3 * H)
    Pv = v_pts.shape[-1] // (3 * H)
    Cdz = kdz.shape[1]
    dt = q.dtype

    qb = query_block or _pick_query_block(
        Qtot, L, H, C, Pq, Pv, Cdz, jnp.dtype(dt).itemsize)
    if qb is None or (query_block and Qtot % query_block):
        return tuple(t.astype(dt) for t in ipa_attention_reference(
            q, k, v, q_pts, k_pts, v_pts, z, kb, bb, kdz, bdz,
            head_weights, mask, inf=inf))

    ops = _prep(q, k, v, q_pts, k_pts, v_pts, z, kb, bb, kdz, bdz,
                head_weights, mask, inf)
    o, opt4, opair = _core_fwd_call(*ops, qb)
    return o, _unheads(opt4), opair.reshape(B, Qtot, H * Cdz)


def ipa_attention_reference(q, k, v, q_pts, k_pts, v_pts, z, kb, bb, kdz, bdz,
                            head_weights, mask, *, inf: float = 1e5,
                            query_block: int | None = None):
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
