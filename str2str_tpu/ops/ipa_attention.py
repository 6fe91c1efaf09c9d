"""Fused Invariant-Point-Attention as a Pallas TPU kernel.

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
      biasT (B, H, L, L)    — per-head slice = free major-dim index
      pzT   (B, L, Cdz, L)  — batch-friendly layout for the opair matmul
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

Numerics: logits and softmax in fp32; matmuls accumulate fp32 (MXU native)
regardless of input dtype; attention weights are cast to the value dtype for
the aggregation matmuls (same as the XLA oracle below).

Reference semantics being reproduced: the [B,H,L,L] materialization of
/root/reference/src/models/net/ipa.py:183-258.

Training support: `ipa_attention` is a custom_vjp whose forward runs this
kernel and whose backward differentiates the (mathematically identical) XLA
oracle — the fused forward is usable under jax.grad.
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


def _kernel(qhat_ref, khat_ref, v_ref, vf_ref, proj_ref,
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
                            pair bias per head — channel dim on a MAJOR axis
                            so both per-head bias and the pz block are free
                            slices]
    outputs (head-major): o (1, H, Qb, C), opt (1, H, Qb, 3*Pv),
                          opair (1, Qb, H, Cdz)
    """
    dt = v_ref.dtype

    ps = []
    for h in range(H):
        logits = jnp.dot(qhat_ref[0, h], khat_ref[0, h],
                         preferred_element_type=jnp.float32)  # (Qb, L)
        logits = logits + proj_ref[0][:, Cdz + h, :].astype(jnp.float32)

        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dt)
        ps.append(p)

        o_ref[0, h] = jnp.dot(p, v_ref[0, h],
                              preferred_element_type=jnp.float32).astype(dt)
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


def _pick_query_block(Qtot: int, L: int, H: int, C: int, Pq: int, Pv: int,
                      Cdz: int, itemsize: int):
    """Largest query block whose VMEM working set fits.

    Fixed cost: the double-buffered full-L k-side blocks. Per-query-block
    cost: bias/pz tiles, qhat, outputs, and fp32 logit temporaries.
    """
    D2 = C + 3 * Pq + 2
    lanes = 128
    if L < lanes:
        # Sub-tile lane widths hit unsupported Mosaic relayouts (and the
        # kernel has nothing to win at tiny L) -> XLA path.
        return None

    def pad(n):  # lane padding of a trailing dim
        return -(-n // lanes) * lanes

    fixed = 2 * (H * D2 * L           # khat (lanes = L, no pad for L >= 128)
                 + H * L * C          # v
                 + H * (3 * Pv + 8) * L  # vf, sublane-padded
                 ) * itemsize
    budget = 15 * 1024 * 1024
    for qb in (128, 64, 32, 16, 8):
        if qb > Qtot or Qtot % qb:
            continue
        per_q = (2 * qb * (Cdz + H) * L * itemsize   # fused projection tile
                 + 2 * qb * pad(D2) * H * itemsize   # qhat
                 + qb * H * L * itemsize             # stacked attn weights
                 + 2 * qb * (C + pad(3 * Pv) + pad(Cdz)) * H * itemsize  # outs
                 + 6 * qb * L * 4)                   # logits/exp f32 temps
        if fixed + per_q <= budget:
            return qb
    return None


def ipa_attention_pallas(q, k, v, q_pts, k_pts, v_pts, z, kb, bb, kdz, bdz,
                         head_weights, mask, *, inf: float = 1e5,
                         query_block: int | None = None):
    """
    q: (B, Qtot, H*C); k/v: (B, L, H*C); q_pts: (B, Qtot, H*3Pq) global
    coords; k_pts: (B, L, H*3Pq); v_pts: (B, L, H*3Pv); z: (B, Qtot, L, Cz);
    kb/bb: linear_b kernel/bias; kdz/bdz: down_z kernel/bias;
    head_weights: (H,) softplus-activated; mask: (B, L).
    Returns (o, o_pt_global, o_pair) with head-flattened channel layouts.
    """
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
        # Normalize the fallback to the kernel's output dtype so callers
        # (and the custom_vjp machinery) see one contract either way.
        return tuple(t.astype(dt) for t in ipa_attention_reference(
            q, k, v, q_pts, k_pts, v_pts, z, kb, bb, kdz, bdz,
            head_weights, mask, inf=inf))

    # ---- host-side (XLA) prep: head-major layouts + folded scalings -------
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
    v4 = heads(v, C)                                      # (B, H, L, C)
    vf4 = heads(v_pts, 3 * Pv).transpose(0, 1, 3, 2)      # (B, H, 3Pv, L)

    # Edge projections: ONE fused XLA pass over z (single z read), emitted
    # directly in the layout the kernel consumes — channel dim on a major
    # axis (free for XLA's copy epilogue, prohibitive to produce in-kernel).
    wcat = jnp.concatenate(
        [kdz.astype(jnp.float32),
         kb.astype(jnp.float32) * math.sqrt(1.0 / 3)], axis=1)  # (Cz, Cdz+H)
    bcat = jnp.concatenate(
        [bdz.astype(jnp.float32),
         bb.astype(jnp.float32) * math.sqrt(1.0 / 3)])          # (Cdz+H,)
    proj = (jnp.einsum("bqlc,cx->bqxl", z, wcat.astype(dt)).astype(jnp.float32)
            + bcat[None, None, :, None]).astype(dt)       # (B, Qtot, Cdz+H, L)

    D2 = C + 3 * Pq + 2
    kern = functools.partial(_kernel, H=H, Cdz=Cdz)
    grid = (B, Qtot // qb)

    o, opt, opair = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, H, qb, D2), lambda b, i: (b, 0, i, 0)),
            pl.BlockSpec((1, H, D2, L), lambda b, i: (b, 0, 0, 0)),
            pl.BlockSpec((1, H, L, C), lambda b, i: (b, 0, 0, 0)),
            pl.BlockSpec((1, H, 3 * Pv, L), lambda b, i: (b, 0, 0, 0)),
            pl.BlockSpec((1, qb, Cdz + H, L), lambda b, i: (b, i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, H, qb, C), lambda b, i: (b, 0, i, 0)),
            pl.BlockSpec((1, H, qb, 3 * Pv), lambda b, i: (b, 0, i, 0)),
            pl.BlockSpec((1, qb, H, Cdz), lambda b, i: (b, i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Qtot, C), dt),
            jax.ShapeDtypeStruct((B, H, Qtot, 3 * Pv), dt),
            jax.ShapeDtypeStruct((B, Qtot, H, Cdz), dt),
        ],
    )(qhat, khat, v4, vf4, proj)

    def unheads(t):  # (B, H, Qtot, p) -> (B, Qtot, H*p)
        return t.transpose(0, 2, 1, 3).reshape(B, Qtot, -1)

    return unheads(o), unheads(opt), opair.reshape(B, Qtot, H * Cdz)


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


# ---- differentiable entry point --------------------------------------------
# Forward = fused Pallas kernel; backward = VJP of the (mathematically
# identical) XLA oracle evaluated at the saved inputs. This keeps training
# on the fused forward path without a hand-written backward kernel; the
# backward itself still runs the XLA layout (optimizing it is future work).

@jax.custom_vjp
def ipa_attention(q, k, v, q_pts, k_pts, v_pts, z, kb, bb, kdz, bdz,
                  head_weights, mask):
    return ipa_attention_pallas(q, k, v, q_pts, k_pts, v_pts, z,
                                kb, bb, kdz, bdz, head_weights, mask)


def _ipa_fwd(*args):
    return ipa_attention_pallas(*args), args


def _ipa_bwd(args, cts):
    # The oracle promotes its outputs to fp32 when the point tensors are
    # fp32 (mixed bf16/fp32 module inputs); the kernel always emits q.dtype.
    # Normalize the oracle to the kernel's output dtypes so the cotangents
    # line up.
    dt = args[0].dtype

    def oracle(*a):
        o, opt, opair = ipa_attention_reference(*a)
        return o.astype(dt), opt.astype(dt), opair.astype(dt)

    _, vjp = jax.vjp(oracle, *args)
    return vjp(cts)


ipa_attention.defvjp(_ipa_fwd, _ipa_bwd)
