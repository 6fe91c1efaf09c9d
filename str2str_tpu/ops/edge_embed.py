"""Fused edge-embedder as a Pallas TPU kernel.

The XLA edge-embedder path (reference denoising_ipa.py:71-159) is the
single largest HBM consumer of a network forward at L=256: it materializes
the [B, L, L, 32] relative-position embedding, the [B, L, L, 22]
self-conditioning distogram one-hots, and three [B, L, L, 128] MLP hiddens
(~1.3 GB per forward at B=8, bf16, by XLA's own cost analysis).

This kernel rebuilds ALL pairwise features from node-sized inputs inside
VMEM — the relative-offset sinusoids from integer residue indices, the
distogram one-hot from self-conditioning CA coordinates via the squared
distance expansion (one (Qb,3)x(3,L) MXU cross term), the rank-L row/col
time-feature parts broadcast-added — and runs the whole 3-layer MLP +
LayerNorm without touching HBM. HBM sees only the node-sized inputs and ONE
write of the final [B, L, L, D] edge embedding (~150 MB per forward).

Layout rules observed throughout (hard-won on this chip): per-head/block
accesses only on major axes, minor-dim broadcasts only on fp32, reshapes
only merge/split LEADING dims, all matmuls in natural (M,K)x(K,N) or
contract-dim1/dim1 form.

Training support: `edge_embed` is a custom_vjp (fused forward, backward =
VJP of the XLA reference below).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ._pallas_util import cp as _cp
from ._pallas_util import emit_proj as _emit_proj
from ._pallas_util import is_tpu as is_supported


def _kernel(rowp_ref, colp_ref, sq_ref, cq_ref, sk_ref, ck_ref,
            scq_ref, sck_ref,
            krel_ref, kd_ref, k1_ref, k2_ref,
            b0_ref, b1_ref, b2_ref, ln_s_ref, ln_b_ref,
            lo2_ref, hi2_ref,
            out_ref, *, self_cond: bool, eps: float):
    """Per program (Qb query rows, full-L cols):
    rowp: (1, Qb, D)  rank-L row part (t-feats @ k0 row block)
    colp: (1, L, D)   rank-L col part
    sq/cq: (1, Qb, HPE) f32, sk/ck: (1, L, HPE) f32 — sin/cos of
      residue_idx * freq per node; the pairwise relative-offset sinusoids
      come from the angle-addition identities (zero in-kernel
      transcendentals): sin(a-b) = sin a cos b - cos a sin b, etc.
    scq:  (1, Qb, 3) f32, sck: (1, L, 3) f32   self-cond CA coords
    krel: (PE, D); kd: (NB, D); k1/k2: (D, D); biases/LN: (1, D)
    lo2/hi2: (1, NB) f32 squared distogram bin edges
    out:  (1, Qb, L, D)
    """
    Qb = rowp_ref.shape[1]
    L = colp_ref.shape[1]
    D = rowp_ref.shape[2]
    dt = out_ref.dtype

    # Relative-position sinusoids via angle addition -> first-layer
    # contribution (MXU).
    sq = sq_ref[0][:, None, :]                            # (Qb, 1, HPE)
    cq = cq_ref[0][:, None, :]
    sk = sk_ref[0][None, :, :]                            # (1, L, HPE)
    ck = ck_ref[0][None, :, :]
    sin_rel = (sq * ck - cq * sk).astype(dt)              # (Qb, L, HPE)
    cos_rel = (cq * ck + sq * sk).astype(dt)
    rel_embed = jnp.concatenate([sin_rel, cos_rel], axis=-1)  # (Qb, L, PE)
    PE = rel_embed.shape[-1]
    x = jnp.dot(rel_embed.reshape(Qb * L, PE), krel_ref[:],
                preferred_element_type=jnp.float32)      # (Qb*L, D) f32

    if self_cond:
        # Squared-distance distogram via the expansion; one-hot by bin-edge
        # comparisons, then a narrow (NB-wide) MXU matmul.
        cross = jax.lax.dot_general(
            scq_ref[0], sck_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (Qb, L)
        qq = jnp.sum(scq_ref[0] * scq_ref[0], axis=-1)   # (Qb,)
        kk = jnp.sum(sck_ref[0] * sck_ref[0], axis=-1)   # (L,)
        d2 = qq[:, None] + kk[None, :] - 2.0 * cross     # (Qb, L) f32
        # Coincident points must land in NO bin (d=0 < the 1e-5 A first
        # edge); the expansion's rounding noise can push the diagonal's
        # exact zero just above (1e-5)^2. Snap the physically-empty
        # sub-0.5 A range to 0 (same rule as edge_embed_reference).
        d2 = jnp.where(d2 < 0.25, 0.0, d2)
        onehot = ((d2[:, :, None] > lo2_ref[0][None, None, :])
                  & (d2[:, :, None] < hi2_ref[0][None, None, :])).astype(dt)
        NB = onehot.shape[-1]
        x = x + jnp.dot(onehot.reshape(Qb * L, NB), kd_ref[:],
                        preferred_element_type=jnp.float32)

    x = x.reshape(Qb, L, D)
    x = x + rowp_ref[0][:, None, :].astype(jnp.float32)
    x = x + colp_ref[0][None, :, :].astype(jnp.float32)
    x = jnp.maximum(x + b0_ref[0], 0.0).astype(dt)

    h = jnp.dot(x.reshape(Qb * L, D), k1_ref[:],
                preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b1_ref[0], 0.0).astype(dt)
    h = jnp.dot(h, k2_ref[:], preferred_element_type=jnp.float32)
    h = (h + b2_ref[0]).reshape(Qb, L, D)

    mean = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(h - mean), axis=-1, keepdims=True)
    h = (h - mean) * jax.lax.rsqrt(var + eps)
    out_ref[0] = (h * ln_s_ref[0] + ln_b_ref[0]).astype(dt)


def _kernel_proj(rowp_ref, colp_ref, sq_ref, cq_ref, sk_ref, ck_ref,
                 scq_ref, sck_ref,
                 krel_ref, kd_ref, k1_ref, k2_ref,
                 b0_ref, b1_ref, b2_ref, ln_s_ref, ln_b_ref,
                 lo2_ref, hi2_ref, wcatT_ref, bcat_ref,
                 out_ref, proj_ref, *, self_cond: bool, eps: float):
    """Mega-fusion variant: additionally emit IPA block 0's fused z
    projection proj[r, x, l] = sum_c z0[r, l, c]*wcat[c, x] + bcat[x] while
    the fresh z0 tile is in VMEM — the attention then never reads z0 (same
    pattern as ops/edge_mlp._kernel_proj)."""
    _kernel(rowp_ref, colp_ref, sq_ref, cq_ref, sk_ref, ck_ref,
            scq_ref, sck_ref, krel_ref, kd_ref, k1_ref, k2_ref,
            b0_ref, b1_ref, b2_ref, ln_s_ref, ln_b_ref, lo2_ref, hi2_ref,
            out_ref, self_cond=self_cond, eps=eps)
    _emit_proj(out_ref[0], wcatT_ref, bcat_ref, proj_ref)


def _pick_block(Lr: int, Lc: int, D: int, itemsize: int):
    if Lc < 128:
        # Sub-tile lane widths are NOT safe: a round-5 attempt to admit
        # L=64 (full-dim lane blocks are Mosaic-legal by the shape rules)
        # MISCOMPILED on the real chip — silent parity error 1.3e-1 at
        # B=50/L=64 (scripts/bench_l64_kernels.py) and an
        # "infer-vector-layout: unsupported shape cast" hard failure in the
        # full net. Keep the XLA path below one full lane tile; the L=64
        # eval bucket is made fast by the chained-sampler overhead fixes
        # instead (sampler.py round-5 notes).
        return None
    budget = 11 * 1024 * 1024
    for qb in (64, 32, 16, 8):
        if Lr % qb:
            continue
        # dominant temps: fp32 sinusoid tensors (lane-padded to 128), the
        # fp32 first-layer accumulator, bf16 hiddens, out tile x2.
        cost = (3 * qb * Lc * 128 * 4        # args/sin/cos
                + 2 * qb * Lc * D * 4        # fp32 matmul accumulators
                + 3 * qb * Lc * D * itemsize  # x/h hiddens
                + 2 * qb * Lc * D * itemsize  # out tile (double-buffered)
                + qb * Lc * 128 * itemsize)   # distogram one-hot
        if cost <= budget:
            return qb
    return None


def edge_embed_pallas(row_part, col_part, residue_idx, sc_ca,
                      krel, kd, k1, k2, b0, b1, b2, ln_scale, ln_bias,
                      *, min_bin: float, max_bin: float, num_bins: int,
                      init_embed_size: int, max_len: int = 2056,
                      self_conditioning: bool = True, eps: float = 1e-6,
                      query_block: int | None = None, proj_w=None,
                      residue_idx_col=None, sc_ca_col=None):
    """row_part: (B, Lr, D), col_part: (B, Lc, D) rank-L first-layer
    contributions; residue_idx: (B, Lr) int; sc_ca: (B, Lr, 3) fp32;
    krel: (PE, D), kd: (NB, D), k1/k2: (D, D); biases/LN 1-D.
    Returns the (B, Lr, Lc, D) edge embedding in row_part.dtype.

    residue_idx_col / sc_ca_col: optional column-side inputs for a
    RECTANGULAR block — the sequence-sharded trunk passes this device's
    column shard (rows span the full sequence, columns the local shard).
    Default: same as the row side (square).

    proj_w: optional (wcatT (X, D), bcat (X,)) — IPA block 0's fused
    z-projection weights; when given the kernel also emits proj
    (B, Lr, X, Lc) and returns the tuple (z0, proj)."""
    B, Lr, D = row_part.shape
    Lc = col_part.shape[1]
    if residue_idx_col is None:
        residue_idx_col = residue_idx
    if sc_ca_col is None:
        sc_ca_col = sc_ca
    dt = row_part.dtype
    qb = query_block or _pick_block(Lr, Lc, D, jnp.dtype(dt).itemsize)
    if qb is None:
        out = edge_embed_reference(
            row_part, col_part, residue_idx, sc_ca, krel, kd, k1, k2,
            b0, b1, b2, ln_scale, ln_bias, min_bin=min_bin, max_bin=max_bin,
            num_bins=num_bins, init_embed_size=init_embed_size,
            max_len=max_len, self_conditioning=self_conditioning, eps=eps,
            residue_idx_col=residue_idx_col, sc_ca_col=sc_ca_col)
        if proj_w is None:
            return out
        return out, _proj_reference(out, *proj_w)
    if proj_w is not None:
        qb = min(qb, 16)  # bound the per-row proj-dot unroll

    half = init_embed_size // 2
    freq = math.pi / max_len ** (2 * jnp.arange(half, dtype=jnp.float32)
                                 / init_embed_size)
    lower = jnp.linspace(min_bin, max_bin, num_bins)
    upper = jnp.concatenate([lower[1:], jnp.asarray([1e8])])
    lo2 = (lower ** 2).reshape(1, -1)
    hi2 = (upper ** 2).reshape(1, -1)

    # Node-sized sinusoid tables; the kernel combines them pairwise via the
    # angle-addition identities.
    phase_q = residue_idx.astype(jnp.float32)[..., None] * freq  # (B,Lr,HPE)
    sin_q, cos_q = jnp.sin(phase_q), jnp.cos(phase_q)
    phase_k = residue_idx_col.astype(jnp.float32)[..., None] * freq
    sin_k, cos_k = jnp.sin(phase_k), jnp.cos(phase_k)
    scq = sc_ca.astype(jnp.float32)
    sck = sc_ca_col.astype(jnp.float32)

    PE, NB = krel.shape[0], kd.shape[0]
    vecs = [v.reshape(1, -1).astype(jnp.float32)
            for v in (b0, b1, b2, ln_scale, ln_bias)]

    in_specs = [
        pl.BlockSpec((1, qb, D), lambda b, i: (b, i, 0)),
        pl.BlockSpec((1, Lc, D), lambda b, i: (b, 0, 0)),
        pl.BlockSpec((1, qb, half), lambda b, i: (b, i, 0)),
        pl.BlockSpec((1, qb, half), lambda b, i: (b, i, 0)),
        pl.BlockSpec((1, Lc, half), lambda b, i: (b, 0, 0)),
        pl.BlockSpec((1, Lc, half), lambda b, i: (b, 0, 0)),
        pl.BlockSpec((1, qb, 3), lambda b, i: (b, i, 0)),
        pl.BlockSpec((1, Lc, 3), lambda b, i: (b, 0, 0)),
        pl.BlockSpec((PE, D), lambda b, i: (0, 0)),
        pl.BlockSpec((NB, D), lambda b, i: (0, 0)),
        pl.BlockSpec((D, D), lambda b, i: (0, 0)),
        pl.BlockSpec((D, D), lambda b, i: (0, 0)),
        pl.BlockSpec((1, D), lambda b, i: (0, 0)),
        pl.BlockSpec((1, D), lambda b, i: (0, 0)),
        pl.BlockSpec((1, D), lambda b, i: (0, 0)),
        pl.BlockSpec((1, D), lambda b, i: (0, 0)),
        pl.BlockSpec((1, D), lambda b, i: (0, 0)),
        pl.BlockSpec((1, NB), lambda b, i: (0, 0)),
        pl.BlockSpec((1, NB), lambda b, i: (0, 0)),
    ]
    args = [row_part, col_part, sin_q, cos_q, sin_k, cos_k, scq, sck,
            krel.astype(dt), kd.astype(dt), k1.astype(dt), k2.astype(dt),
            *vecs, lo2, hi2]

    if proj_w is None:
        kern = functools.partial(_kernel, self_cond=self_conditioning,
                                 eps=eps)
        return pl.pallas_call(
            kern,
            compiler_params=_cp(32 * 1024 * 1024),
            grid=(B, Lr // qb),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, qb, Lc, D), lambda b, i: (b, i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, Lr, Lc, D), dt),
        )(*args)

    wcatT, bcat = proj_w
    X = wcatT.shape[0]
    in_specs += [
        pl.BlockSpec((X, D), lambda b, i: (0, 0)),
        pl.BlockSpec((1, X), lambda b, i: (0, 0)),
    ]
    args += [wcatT.astype(dt), bcat.reshape(1, -1).astype(jnp.float32)]
    kern = functools.partial(_kernel_proj, self_cond=self_conditioning,
                             eps=eps)
    return pl.pallas_call(
        kern,
        compiler_params=_cp(32 * 1024 * 1024),
        grid=(B, Lr // qb),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, qb, Lc, D), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, qb, X, Lc), lambda b, i: (b, i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Lr, Lc, D), dt),
            jax.ShapeDtypeStruct((B, Lr, X, Lc), dt),
        ],
    )(*args)


def _proj_reference(z0, wcatT, bcat):
    dt = z0.dtype
    proj = (jnp.einsum("bilc,xc->bixl", z0, wcatT.astype(dt))
            .astype(jnp.float32) + bcat.astype(jnp.float32)[None, None, :, None])
    return proj.astype(dt)


def edge_embed_reference(row_part, col_part, residue_idx, sc_ca,
                         krel, kd, k1, k2, b0, b1, b2, ln_scale, ln_bias,
                         *, min_bin: float, max_bin: float, num_bins: int,
                         init_embed_size: int, max_len: int = 2056,
                         self_conditioning: bool = True, eps: float = 1e-6,
                         query_block: int | None = None,
                         residue_idx_col=None, sc_ca_col=None):
    """Plain-XLA oracle with identical inputs/outputs.

    residue_idx_col / sc_ca_col: optional column-side inputs for a
    RECTANGULAR edge block (rows = full length, cols = a local key shard) —
    the sequence-sharded long-context path builds only its column shard of
    the edge embedding. col_part must then be the matching (B, Lk, D) slice.
    Defaults to the square (self) case."""
    dt = row_part.dtype
    if residue_idx_col is None:
        residue_idx_col = residue_idx
    if sc_ca_col is None:
        sc_ca_col = sc_ca
    half = init_embed_size // 2
    freq = math.pi / max_len ** (2 * jnp.arange(half, dtype=jnp.float32)
                                 / init_embed_size)
    # Pairwise relative-offset sinusoids via the angle-addition identities
    # from NODE-sized tables (same construction as the fused kernel):
    # sin(a-b) = sin a cos b - cos a sin b. The direct form evaluates
    # sin/cos on the full [B, L, L, half] tensor — ~25M transcendentals per
    # forward at the L=64 eval bucket's B=184 — where this form needs
    # 2*B*L*half and four broadcast multiplies.
    phase_q = residue_idx.astype(jnp.float32)[..., None] * freq
    phase_k = residue_idx_col.astype(jnp.float32)[..., None] * freq
    sin_q, cos_q = jnp.sin(phase_q), jnp.cos(phase_q)
    sin_k, cos_k = jnp.sin(phase_k), jnp.cos(phase_k)
    sin_rel = (sin_q[:, :, None, :] * cos_k[:, None, :, :]
               - cos_q[:, :, None, :] * sin_k[:, None, :, :])
    cos_rel = (cos_q[:, :, None, :] * cos_k[:, None, :, :]
               + sin_q[:, :, None, :] * sin_k[:, None, :, :])
    rel_embed = jnp.concatenate([sin_rel, cos_rel], -1).astype(dt)
    x = jnp.einsum("bijc,cd->bijd", rel_embed, krel.astype(dt),
                   preferred_element_type=jnp.float32)

    if self_conditioning:
        # Squared-distance expansion (same form as the fused kernel): the
        # [B, L, L, 3] displacement tensor runs every VPU op at lane
        # width 3; |q-k|^2 = |q|^2 + |k|^2 - 2<q,k> makes the cross term
        # one MXU matmul and compares against SQUARED bin edges
        # (d > lo <=> d^2 > lo^2 for non-negatives — reference
        # geo_utils.py:44 binning semantics preserved).
        scq = sc_ca.astype(jnp.float32)
        sck = sc_ca_col.astype(jnp.float32)
        # HIGHEST: on TPU a DEFAULT-precision f32 dot is a single bf16 MXU
        # pass — d^2's cancellation (qq + kk - 2qk for nearby points) then
        # carries ~1% of |q|^2 as noise, larger than a bin width for
        # CoM-distant coordinates. The cross term is K=3, so the multi-pass
        # cost is nil.
        cross = jnp.einsum("bic,bjc->bij", scq, sck,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
        d2 = (jnp.sum(scq * scq, -1)[..., :, None]
              + jnp.sum(sck * sck, -1)[..., None, :] - 2.0 * cross)
        # Coincident points (the diagonal; the all-zero sc_ca_t init) must
        # produce d=0 -> NO bin (first edge 1e-5 A, reference
        # geo_utils.py:44): snap the sub-resolution range to exactly 0 —
        # the expansion's rounding noise otherwise lands d^2 just above
        # (1e-5)^2. Physically exact: distinct residues' CAs are never
        # within 0.5 A.
        d2 = jnp.where(d2 < 0.25, 0.0, d2)
        lower = jnp.linspace(min_bin, max_bin, num_bins)
        upper = jnp.concatenate([lower[1:], jnp.asarray([1e8])])
        onehot = ((d2[..., None] > lower ** 2)
                  & (d2[..., None] < upper ** 2)).astype(dt)
        x = x + jnp.einsum("bijc,cd->bijd", onehot, kd.astype(dt),
                           preferred_element_type=jnp.float32)

    x = x + row_part[:, :, None, :].astype(jnp.float32)
    x = x + col_part[:, None, :, :].astype(jnp.float32)
    x = jnp.maximum(x + b0, 0.0).astype(dt)
    h = jnp.einsum("bijc,cd->bijd", x, k1.astype(dt),
                   preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b1, 0.0).astype(dt)
    h = jnp.einsum("bijc,cd->bijd", h, k2.astype(dt),
                   preferred_element_type=jnp.float32) + b2
    mean = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(h - mean), axis=-1, keepdims=True)
    h = (h - mean) * jax.lax.rsqrt(var + eps)
    return (h * ln_scale + ln_bias).astype(dt)


# ---- hand-written backward kernel ------------------------------------------
# Recomputes the pairwise features (angle-addition sinusoids, distance
# one-hots) and the MLP hiddens for a row block entirely in VMEM, then walks
# LN -> 2 matmuls -> relu -> first layer backwards. The feature builders are
# gradient-free (integer residue indices; the one-hot distogram is piecewise
# constant in sc_ca), so the only non-weight grads are the rank-L row/col
# first-layer contributions.

def _bwd_body(rowp_ref, colp_ref, sq_ref, cq_ref, sk_ref, ck_ref,
              scq_ref, sck_ref,
              krel_ref, kd_ref, k1_ref, k2_ref,
              b0_ref, b1_ref, b2_ref, ln_s_ref, ln_b_ref,
              lo2_ref, hi2_ref, dout_ref,
              drowp_ref, dcolp_ref, dkrel_ref, dkd_ref, dk1_ref, dk2_ref,
              db0_ref, db1_ref, db2_ref, dls_ref, dlb_ref,
              proj_pack, self_cond: bool, eps: float):
    """proj_pack: None, or (wcatT_ref, dprojT_ref, dwcatT_ref, dbcat_ref)
    for the mega-fusion variant whose forward also emitted IPA block 0's
    fused z projection."""
    first_in_batch = pl.program_id(1) == 0
    first_overall = (pl.program_id(0) == 0) & first_in_batch

    @pl.when(first_in_batch)
    def _zero_batch():
        dcolp_ref[...] = jnp.zeros(dcolp_ref.shape, dcolp_ref.dtype)

    @pl.when(first_overall)
    def _zero_weights():
        refs = [dkrel_ref, dkd_ref, dk1_ref, dk2_ref,
                db0_ref, db1_ref, db2_ref, dls_ref, dlb_ref]
        if proj_pack is not None:
            refs += [proj_pack[2], proj_pack[3]]
        for ref in refs:
            ref[...] = jnp.zeros(ref.shape, ref.dtype)

    Qb = rowp_ref.shape[1]
    L = colp_ref.shape[1]
    D = rowp_ref.shape[2]
    dt = rowp_ref.dtype

    # ---- recompute forward (identical math to _kernel) ------------------
    sq = sq_ref[0][:, None, :]
    cq = cq_ref[0][:, None, :]
    sk = sk_ref[0][None, :, :]
    ck = ck_ref[0][None, :, :]
    sin_rel = (sq * ck - cq * sk).astype(dt)
    cos_rel = (cq * ck + sq * sk).astype(dt)
    rel_embed = jnp.concatenate([sin_rel, cos_rel], axis=-1)  # (Qb, L, PE)
    PE = rel_embed.shape[-1]
    rel2 = rel_embed.reshape(Qb * L, PE)
    x = jnp.dot(rel2, krel_ref[:], preferred_element_type=jnp.float32)

    if self_cond:
        cross = jax.lax.dot_general(
            scq_ref[0], sck_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        qq = jnp.sum(scq_ref[0] * scq_ref[0], axis=-1)
        kk = jnp.sum(sck_ref[0] * sck_ref[0], axis=-1)
        d2 = qq[:, None] + kk[None, :] - 2.0 * cross
        d2 = jnp.where(d2 < 0.25, 0.0, d2)  # same snap as the forward
        onehot = ((d2[:, :, None] > lo2_ref[0][None, None, :])
                  & (d2[:, :, None] < hi2_ref[0][None, None, :])).astype(dt)
        NB = onehot.shape[-1]
        oh2 = onehot.reshape(Qb * L, NB)
        x = x + jnp.dot(oh2, kd_ref[:], preferred_element_type=jnp.float32)

    x = x.reshape(Qb, L, D)
    x = x + rowp_ref[0][:, None, :].astype(jnp.float32)
    x = x + colp_ref[0][None, :, :].astype(jnp.float32)
    x = jnp.maximum(x + b0_ref[0], 0.0).astype(dt)        # (Qb, L, D)
    x2 = x.reshape(Qb * L, D)

    h1 = jnp.dot(x2, k1_ref[:], preferred_element_type=jnp.float32)
    h1 = jnp.maximum(h1 + b1_ref[0], 0.0).astype(dt)      # (Qb*L, D)
    h2 = jnp.dot(h1, k2_ref[:], preferred_element_type=jnp.float32)
    h2 = (h2 + b2_ref[0]).reshape(Qb, L, D)

    mean = jnp.mean(h2, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(h2 - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (h2 - mean) * rstd                             # (Qb, L, D) f32

    # ---- LayerNorm backward --------------------------------------------
    dout = dout_ref[0].astype(jnp.float32)
    if proj_pack is not None:
        wcatT_ref, dprojT_ref, dwcatT_ref, dbcat_ref = proj_pack
        wT = wcatT_ref[:].astype(dt)                      # (X, D)
        X = wT.shape[0]
        o_dt = (xhat * ln_s_ref[0] + ln_b_ref[0]).astype(dt)
        dprojT = dprojT_ref[0]                            # (Qb, L, X) dt
        extra = []
        for r in range(Qb):
            extra.append(jnp.dot(dprojT[r], wT,
                                 preferred_element_type=jnp.float32))
        dout = dout + jnp.stack(extra, axis=0)
        dpT2 = dprojT.reshape(Qb * L, X)
        dwcatT_ref[...] += jax.lax.dot_general(
            dpT2, o_dt.reshape(Qb * L, D), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # (X, D)
        dbcat_ref[...] += jnp.sum(dpT2.astype(jnp.float32), axis=0,
                                  keepdims=True)
    dls_ref[...] += jnp.sum((dout * xhat).reshape(Qb * L, D), axis=0,
                            keepdims=True)
    dlb_ref[...] += jnp.sum(dout.reshape(Qb * L, D), axis=0, keepdims=True)
    g = dout * ln_s_ref[0]
    dh2 = (g - jnp.mean(g, axis=-1, keepdims=True)
           - xhat * jnp.mean(g * xhat, axis=-1, keepdims=True)) * rstd
    dh2_2 = dh2.reshape(Qb * L, D)
    dh2c = dh2_2.astype(dt)
    db2_ref[...] += jnp.sum(dh2_2, axis=0, keepdims=True)

    # ---- second MLP layer ----------------------------------------------
    dk2_ref[...] += jax.lax.dot_general(
        h1, dh2c, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dh1 = jax.lax.dot_general(dh2c, k2_ref[:], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    # f32 compare: Mosaic on this target rejects bf16 comparisons
    dh1 = jnp.where(h1.astype(jnp.float32) > 0.0, dh1, 0.0)
    dh1c = dh1.astype(dt)
    db1_ref[...] += jnp.sum(dh1, axis=0, keepdims=True)

    # ---- first MLP layer -----------------------------------------------
    dk1_ref[...] += jax.lax.dot_general(
        x2, dh1c, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dx = jax.lax.dot_general(dh1c, k1_ref[:], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dx = jnp.where(x2.astype(jnp.float32) > 0.0, dx, 0.0)                       # (Qb*L, D) f32
    dxc = dx.astype(dt)
    db0_ref[...] += jnp.sum(dx, axis=0, keepdims=True)

    dx3 = dx.reshape(Qb, L, D)
    drowp_ref[0] = jnp.sum(dx3, axis=1).astype(drowp_ref.dtype)
    dcolp_ref[0] += jnp.sum(dx3, axis=0)

    dkrel_ref[...] += jax.lax.dot_general(
        rel2, dxc, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    if self_cond:
        dkd_ref[...] += jax.lax.dot_general(
            oh2, dxc, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


def _bwd_kernel(*refs, self_cond: bool, eps: float):
    _bwd_body(*refs, None, self_cond, eps)


def _bwd_kernel_proj(*refs, self_cond: bool, eps: float):
    (rowp, colp, sq, cq, sk, ck, scq, sck, krel, kd, k1, k2,
     b0, b1, b2, lns, lnb, lo2, hi2, dout, wcatT, dprojT,
     drowp, dcolp, dkrel, dkd, dk1, dk2,
     db0, db1, db2, dls, dlb, dwcatT, dbcat) = refs
    _bwd_body(rowp, colp, sq, cq, sk, ck, scq, sck, krel, kd, k1, k2,
              b0, b1, b2, lns, lnb, lo2, hi2, dout,
              drowp, dcolp, dkrel, dkd, dk1, dk2,
              db0, db1, db2, dls, dlb,
              (wcatT, dprojT, dwcatT, dbcat), self_cond, eps)


def _pick_bwd_block(L: int, D: int, itemsize: int):
    if L < 128 and _FORCE_QB is None:
        return None
    if _FORCE_QB is not None:
        return _FORCE_QB
    budget = 12 * 1024 * 1024
    # Candidates stay multiples of 8 (Mosaic block-shape constraint on the
    # (1, qb, D) row-grad blocks).
    for qb in (32, 16, 8):
        if L % qb:
            continue
        cost = (3 * qb * L * 128 * 4          # sinusoid f32 temps (lane-pad)
                + 4 * qb * L * D * 4          # x/h2/xhat/dout f32 live set
                + 4 * qb * L * D * itemsize   # x/h1/onehot/dx dt tensors
                + 2 * qb * L * D * itemsize   # dout in (double-buffered)
                + qb * L * 128 * itemsize)    # one-hot (lane-padded)
        if cost <= budget:
            return qb
    return None


# Test hook (mirrors ipa_attention._FORCE_QB).
_FORCE_QB: int | None = None


def edge_embed_bwd_pallas(row_part, col_part, residue_idx, sc_ca,
                          krel, kd, k1, k2, b0, b1, b2, ln_scale, ln_bias,
                          dout, *, min_bin, max_bin, num_bins,
                          init_embed_size, max_len=2056,
                          self_conditioning=True, eps=1e-6,
                          proj_w=None, dproj=None):
    B, L, D = row_part.shape
    dt = row_part.dtype
    qb = _pick_bwd_block(L, D, jnp.dtype(dt).itemsize)
    if qb is None:
        return None

    half = init_embed_size // 2
    freq = math.pi / max_len ** (2 * jnp.arange(half, dtype=jnp.float32)
                                 / init_embed_size)
    lower = jnp.linspace(min_bin, max_bin, num_bins)
    upper = jnp.concatenate([lower[1:], jnp.asarray([1e8])])
    lo2 = (lower ** 2).reshape(1, -1)
    hi2 = (upper ** 2).reshape(1, -1)
    phase = residue_idx.astype(jnp.float32)[..., None] * freq
    sin_p, cos_p = jnp.sin(phase), jnp.cos(phase)
    scf = sc_ca.astype(jnp.float32)

    PE, NB = krel.shape[0], kd.shape[0]
    vecs = [v.reshape(1, -1).astype(jnp.float32)
            for v in (b0, b1, b2, ln_scale, ln_bias)]
    f32 = jnp.float32

    kern = functools.partial(_bwd_kernel, self_cond=self_conditioning,
                             eps=eps)
    extra_in_specs, extra_out_specs, extra_out_shapes, extra_args = [], [], [], []
    if proj_w is not None:
        kern = functools.partial(_bwd_kernel_proj, self_cond=self_conditioning,
                                 eps=eps)
        wcatT, _bcat = proj_w
        X = wcatT.shape[0]
        dprojT = dproj.astype(dt).transpose(0, 1, 3, 2)   # (B, L, L, X)
        extra_in_specs = [
            pl.BlockSpec((X, D), lambda b, i: (0, 0)),
            pl.BlockSpec((1, qb, L, X), lambda b, i: (b, i, 0, 0)),
        ]
        extra_args = [wcatT.astype(dt), dprojT]
        extra_out_specs = [
            pl.BlockSpec((X, D), lambda b, i: (0, 0)),
            pl.BlockSpec((1, X), lambda b, i: (0, 0)),
        ]
        extra_out_shapes = [
            jax.ShapeDtypeStruct((X, D), f32),            # dwcatT (accum)
            jax.ShapeDtypeStruct((1, X), f32),            # dbcat (accum)
        ]
    return pl.pallas_call(
        kern,
        compiler_params=_cp(64 * 1024 * 1024),
        grid=(B, L // qb),
        in_specs=[
            pl.BlockSpec((1, qb, D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, L, D), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, qb, half), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, qb, half), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, L, half), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, L, half), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, qb, 3), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, L, 3), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((PE, D), lambda b, i: (0, 0)),
            pl.BlockSpec((NB, D), lambda b, i: (0, 0)),
            pl.BlockSpec((D, D), lambda b, i: (0, 0)),
            pl.BlockSpec((D, D), lambda b, i: (0, 0)),
            pl.BlockSpec((1, D), lambda b, i: (0, 0)),
            pl.BlockSpec((1, D), lambda b, i: (0, 0)),
            pl.BlockSpec((1, D), lambda b, i: (0, 0)),
            pl.BlockSpec((1, D), lambda b, i: (0, 0)),
            pl.BlockSpec((1, D), lambda b, i: (0, 0)),
            pl.BlockSpec((1, NB), lambda b, i: (0, 0)),
            pl.BlockSpec((1, NB), lambda b, i: (0, 0)),
            pl.BlockSpec((1, qb, L, D), lambda b, i: (b, i, 0, 0)),
            *extra_in_specs,
        ],
        out_specs=[
            pl.BlockSpec((1, qb, D), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, L, D), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((PE, D), lambda b, i: (0, 0)),
            pl.BlockSpec((NB, D), lambda b, i: (0, 0)),
            pl.BlockSpec((D, D), lambda b, i: (0, 0)),
            pl.BlockSpec((D, D), lambda b, i: (0, 0)),
            pl.BlockSpec((1, D), lambda b, i: (0, 0)),
            pl.BlockSpec((1, D), lambda b, i: (0, 0)),
            pl.BlockSpec((1, D), lambda b, i: (0, 0)),
            pl.BlockSpec((1, D), lambda b, i: (0, 0)),
            pl.BlockSpec((1, D), lambda b, i: (0, 0)),
            *extra_out_specs,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, L, D), f32),   # drowp
            jax.ShapeDtypeStruct((B, L, D), f32),   # dcolp (accum per b)
            jax.ShapeDtypeStruct((PE, D), f32),     # dkrel (accum)
            jax.ShapeDtypeStruct((NB, D), f32),     # dkd (accum)
            jax.ShapeDtypeStruct((D, D), f32),      # dk1 (accum)
            jax.ShapeDtypeStruct((D, D), f32),      # dk2 (accum)
            jax.ShapeDtypeStruct((1, D), f32),      # db0
            jax.ShapeDtypeStruct((1, D), f32),      # db1
            jax.ShapeDtypeStruct((1, D), f32),      # db2
            jax.ShapeDtypeStruct((1, D), f32),      # dls
            jax.ShapeDtypeStruct((1, D), f32),      # dlb
            *extra_out_shapes,
        ],
    )(row_part, col_part, sin_p, cos_p, sin_p, cos_p, scf, scf,
      krel.astype(dt), kd.astype(dt), k1.astype(dt), k2.astype(dt),
      *vecs, lo2, hi2, dout.astype(dt), *extra_args)


# ---- differentiable entry point --------------------------------------------
# Forward AND backward run hand-written Pallas kernels; the integer residue
# indices and the (piecewise-constant) distogram input get symbolic-zero
# cotangents, matching the XLA reference's autodiff.

@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15, 16, 17, 18))
def edge_embed(row_part, col_part, residue_idx, sc_ca,
               krel, kd, k1, k2, b0, b1, b2, ln_scale, ln_bias,
               min_bin, max_bin, num_bins, init_embed_size, max_len,
               self_conditioning):
    return edge_embed_pallas(
        row_part, col_part, residue_idx, sc_ca, krel, kd, k1, k2,
        b0, b1, b2, ln_scale, ln_bias, min_bin=min_bin, max_bin=max_bin,
        num_bins=num_bins, init_embed_size=init_embed_size, max_len=max_len,
        self_conditioning=self_conditioning)


def _ee_fwd(row_part, col_part, residue_idx, sc_ca,
            krel, kd, k1, k2, b0, b1, b2, ln_scale, ln_bias,
            min_bin, max_bin, num_bins, init_embed_size, max_len,
            self_conditioning):
    out = edge_embed_pallas(
        row_part, col_part, residue_idx, sc_ca, krel, kd, k1, k2,
        b0, b1, b2, ln_scale, ln_bias, min_bin=min_bin, max_bin=max_bin,
        num_bins=num_bins, init_embed_size=init_embed_size, max_len=max_len,
        self_conditioning=self_conditioning)
    return out, (row_part, col_part, residue_idx, sc_ca, krel, kd, k1, k2,
                 b0, b1, b2, ln_scale, ln_bias)


def _ee_bwd(min_bin, max_bin, num_bins, init_embed_size, max_len,
            self_conditioning, saved, ct):
    (row_part, col_part, residue_idx, sc_ca,
     krel, kd, k1, k2, b0, b1, b2, ln_scale, ln_bias) = saved
    outs = edge_embed_bwd_pallas(
        row_part, col_part, residue_idx, sc_ca, krel, kd, k1, k2,
        b0, b1, b2, ln_scale, ln_bias, ct,
        min_bin=min_bin, max_bin=max_bin, num_bins=num_bins,
        init_embed_size=init_embed_size, max_len=max_len,
        self_conditioning=self_conditioning)
    if outs is None:
        # Shapes outside the kernel's envelope: differentiate the XLA
        # reference instead.
        _, vjp = jax.vjp(
            lambda *a: edge_embed_reference(
                *a, min_bin=min_bin, max_bin=max_bin, num_bins=num_bins,
                init_embed_size=init_embed_size, max_len=max_len,
                self_conditioning=self_conditioning), *saved)
        return vjp(ct)
    (drowp, dcolp, dkrel, dkd, dk1, dk2,
     db0, db1, db2, dls, dlb) = outs
    import numpy as _np
    f0 = jax.dtypes.float0
    return (drowp.astype(row_part.dtype), dcolp.astype(col_part.dtype),
            _np.zeros(residue_idx.shape, f0)
            if jnp.issubdtype(residue_idx.dtype, jnp.integer)
            else jnp.zeros_like(residue_idx),
            jnp.zeros_like(sc_ca),
            dkrel.astype(krel.dtype), dkd.astype(kd.dtype),
            dk1.astype(k1.dtype), dk2.astype(k2.dtype),
            db0.reshape(b0.shape).astype(b0.dtype),
            db1.reshape(b1.shape).astype(b1.dtype),
            db2.reshape(b2.shape).astype(b2.dtype),
            dls.reshape(ln_scale.shape).astype(ln_scale.dtype),
            dlb.reshape(ln_bias.shape).astype(ln_bias.dtype))


edge_embed.defvjp(_ee_fwd, _ee_bwd)


# ---- mega-fusion variant: also emit IPA block 0's fused z projection -------

@functools.partial(jax.custom_vjp, nondiff_argnums=(15, 16, 17, 18, 19, 20))
def edge_embed_proj(row_part, col_part, residue_idx, sc_ca,
                    krel, kd, k1, k2, b0, b1, b2, ln_scale, ln_bias,
                    wcatT, bcat,
                    min_bin, max_bin, num_bins, init_embed_size, max_len,
                    self_conditioning):
    return edge_embed_pallas(
        row_part, col_part, residue_idx, sc_ca, krel, kd, k1, k2,
        b0, b1, b2, ln_scale, ln_bias, min_bin=min_bin, max_bin=max_bin,
        num_bins=num_bins, init_embed_size=init_embed_size, max_len=max_len,
        self_conditioning=self_conditioning, proj_w=(wcatT, bcat))


def _eep_fwd(row_part, col_part, residue_idx, sc_ca,
             krel, kd, k1, k2, b0, b1, b2, ln_scale, ln_bias, wcatT, bcat,
             min_bin, max_bin, num_bins, init_embed_size, max_len,
             self_conditioning):
    out = edge_embed_pallas(
        row_part, col_part, residue_idx, sc_ca, krel, kd, k1, k2,
        b0, b1, b2, ln_scale, ln_bias, min_bin=min_bin, max_bin=max_bin,
        num_bins=num_bins, init_embed_size=init_embed_size, max_len=max_len,
        self_conditioning=self_conditioning, proj_w=(wcatT, bcat))
    return out, (row_part, col_part, residue_idx, sc_ca, krel, kd, k1, k2,
                 b0, b1, b2, ln_scale, ln_bias, wcatT, bcat)


def _eep_bwd(min_bin, max_bin, num_bins, init_embed_size, max_len,
             self_conditioning, saved, cts):
    (row_part, col_part, residue_idx, sc_ca,
     krel, kd, k1, k2, b0, b1, b2, ln_scale, ln_bias, wcatT, bcat) = saved
    dout, dproj = cts
    outs = edge_embed_bwd_pallas(
        row_part, col_part, residue_idx, sc_ca, krel, kd, k1, k2,
        b0, b1, b2, ln_scale, ln_bias, dout,
        min_bin=min_bin, max_bin=max_bin, num_bins=num_bins,
        init_embed_size=init_embed_size, max_len=max_len,
        self_conditioning=self_conditioning,
        proj_w=(wcatT, bcat), dproj=dproj)
    if outs is None:
        def ref(*a):
            out = edge_embed_reference(
                *a[:13], min_bin=min_bin, max_bin=max_bin, num_bins=num_bins,
                init_embed_size=init_embed_size, max_len=max_len,
                self_conditioning=self_conditioning)
            return out, _proj_reference(out, a[13], a[14])
        _, vjp = jax.vjp(ref, *saved)
        return vjp(cts)
    (drowp, dcolp, dkrel, dkd, dk1, dk2,
     db0, db1, db2, dls, dlb, dwcatT, dbcat) = outs
    import numpy as _np
    f0 = jax.dtypes.float0
    return (drowp.astype(row_part.dtype), dcolp.astype(col_part.dtype),
            _np.zeros(residue_idx.shape, f0)
            if jnp.issubdtype(residue_idx.dtype, jnp.integer)
            else jnp.zeros_like(residue_idx),
            jnp.zeros_like(sc_ca),
            dkrel.astype(krel.dtype), dkd.astype(kd.dtype),
            dk1.astype(k1.dtype), dk2.astype(k2.dtype),
            db0.reshape(b0.shape).astype(b0.dtype),
            db1.reshape(b1.shape).astype(b1.dtype),
            db2.reshape(b2.shape).astype(b2.dtype),
            dls.reshape(ln_scale.shape).astype(ln_scale.dtype),
            dlb.reshape(ln_bias.shape).astype(ln_bias.dtype),
            dwcatT.astype(wcatT.dtype),
            dbcat.reshape(bcat.shape).astype(bcat.dtype))


edge_embed_proj.defvjp(_eep_fwd, _eep_bwd)


def edge_embed_proj_reference(row_part, col_part, residue_idx, sc_ca,
                              krel, kd, k1, k2, b0, b1, b2,
                              ln_scale, ln_bias, wcatT, bcat,
                              *, min_bin, max_bin, num_bins,
                              init_embed_size, max_len=2056,
                              self_conditioning=True, eps=1e-6):
    out = edge_embed_reference(
        row_part, col_part, residue_idx, sc_ca, krel, kd, k1, k2,
        b0, b1, b2, ln_scale, ln_bias, min_bin=min_bin, max_bin=max_bin,
        num_bins=num_bins, init_embed_size=init_embed_size, max_len=max_len,
        self_conditioning=self_conditioning, eps=eps)
    return out, _proj_reference(out, wcatT, bcat)


# ---- rectangular (column-shard) differentiable entry ------------------------
# The sequence-sharded trunk embeds this device's (B, Lr, Lc) block: rows
# span the full sequence, columns the local shard. Forward runs the fused
# kernel (rectangular block specs); backward differentiates the XLA
# reference — the sharded path is inference-first, matching
# ipa_attention._attn_core_partial.

@functools.partial(jax.custom_vjp, nondiff_argnums=(15, 16, 17, 18, 19, 20))
def edge_embed_cols(row_part, col_part, residue_idx, sc_ca,
                    residue_idx_col, sc_ca_col,
                    krel, kd, k1, k2, b0, b1, b2, ln_scale, ln_bias,
                    min_bin, max_bin, num_bins, init_embed_size, max_len,
                    self_conditioning):
    return edge_embed_pallas(
        row_part, col_part, residue_idx, sc_ca, krel, kd, k1, k2,
        b0, b1, b2, ln_scale, ln_bias, min_bin=min_bin, max_bin=max_bin,
        num_bins=num_bins, init_embed_size=init_embed_size, max_len=max_len,
        self_conditioning=self_conditioning,
        residue_idx_col=residue_idx_col, sc_ca_col=sc_ca_col)


def _eec_fwd(row_part, col_part, residue_idx, sc_ca,
             residue_idx_col, sc_ca_col,
             krel, kd, k1, k2, b0, b1, b2, ln_scale, ln_bias,
             min_bin, max_bin, num_bins, init_embed_size, max_len,
             self_conditioning):
    out = edge_embed_cols(
        row_part, col_part, residue_idx, sc_ca, residue_idx_col, sc_ca_col,
        krel, kd, k1, k2, b0, b1, b2, ln_scale, ln_bias,
        min_bin, max_bin, num_bins, init_embed_size, max_len,
        self_conditioning)
    return out, (row_part, col_part, residue_idx, sc_ca,
                 residue_idx_col, sc_ca_col,
                 krel, kd, k1, k2, b0, b1, b2, ln_scale, ln_bias)


def _eec_bwd(min_bin, max_bin, num_bins, init_embed_size, max_len,
             self_conditioning, saved, ct):
    def ref(row_part, col_part, residue_idx, sc_ca,
            residue_idx_col, sc_ca_col, *weights):
        return edge_embed_reference(
            row_part, col_part, residue_idx, sc_ca, *weights,
            min_bin=min_bin, max_bin=max_bin, num_bins=num_bins,
            init_embed_size=init_embed_size, max_len=max_len,
            self_conditioning=self_conditioning,
            residue_idx_col=residue_idx_col, sc_ca_col=sc_ca_col)

    _, vjp = jax.vjp(ref, *saved)
    return vjp(ct)


edge_embed_cols.defvjp(_eec_fwd, _eec_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(17, 18, 19, 20, 21, 22))
def edge_embed_cols_proj(row_part, col_part, residue_idx, sc_ca,
                         residue_idx_col, sc_ca_col,
                         krel, kd, k1, k2, b0, b1, b2, ln_scale, ln_bias,
                         wcatT, bcat,
                         min_bin, max_bin, num_bins, init_embed_size,
                         max_len, self_conditioning):
    """Rectangular embedder + block-0 proj emission (sharded mega-fusion):
    returns (z0_local (B, Lr, Lc, D), proj0_local (B, Lr, X, Lc))."""
    return edge_embed_pallas(
        row_part, col_part, residue_idx, sc_ca, krel, kd, k1, k2,
        b0, b1, b2, ln_scale, ln_bias, min_bin=min_bin, max_bin=max_bin,
        num_bins=num_bins, init_embed_size=init_embed_size, max_len=max_len,
        self_conditioning=self_conditioning, proj_w=(wcatT, bcat),
        residue_idx_col=residue_idx_col, sc_ca_col=sc_ca_col)


def _eecp_fwd(row_part, col_part, residue_idx, sc_ca,
              residue_idx_col, sc_ca_col,
              krel, kd, k1, k2, b0, b1, b2, ln_scale, ln_bias, wcatT, bcat,
              min_bin, max_bin, num_bins, init_embed_size, max_len,
              self_conditioning):
    out = edge_embed_cols_proj(
        row_part, col_part, residue_idx, sc_ca, residue_idx_col, sc_ca_col,
        krel, kd, k1, k2, b0, b1, b2, ln_scale, ln_bias, wcatT, bcat,
        min_bin, max_bin, num_bins, init_embed_size, max_len,
        self_conditioning)
    return out, (row_part, col_part, residue_idx, sc_ca,
                 residue_idx_col, sc_ca_col,
                 krel, kd, k1, k2, b0, b1, b2, ln_scale, ln_bias,
                 wcatT, bcat)


def _eecp_bwd(min_bin, max_bin, num_bins, init_embed_size, max_len,
              self_conditioning, saved, cts):
    def ref(row_part, col_part, residue_idx, sc_ca,
            residue_idx_col, sc_ca_col, krel, kd, k1, k2,
            b0, b1, b2, ln_scale, ln_bias, wcatT, bcat):
        z0 = edge_embed_reference(
            row_part, col_part, residue_idx, sc_ca,
            krel, kd, k1, k2, b0, b1, b2, ln_scale, ln_bias,
            min_bin=min_bin, max_bin=max_bin, num_bins=num_bins,
            init_embed_size=init_embed_size, max_len=max_len,
            self_conditioning=self_conditioning,
            residue_idx_col=residue_idx_col, sc_ca_col=sc_ca_col)
        return z0, _proj_reference(z0, wcatT, bcat)

    _, vjp = jax.vjp(ref, *saved)
    return vjp(cts)


edge_embed_cols_proj.defvjp(_eecp_fwd, _eecp_bwd)
