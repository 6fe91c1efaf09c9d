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


def _pick_block(L: int, D: int, itemsize: int):
    if L < 128:
        # Sub-tile lane widths hit unsupported Mosaic relayouts (and there
        # is nothing to win at tiny L) -> XLA path.
        return None
    budget = 11 * 1024 * 1024
    for qb in (64, 32, 16, 8):
        if L % qb:
            continue
        # dominant temps: fp32 sinusoid tensors (lane-padded to 128), the
        # fp32 first-layer accumulator, bf16 hiddens, out tile x2.
        cost = (3 * qb * L * 128 * 4        # args/sin/cos
                + 2 * qb * L * D * 4        # fp32 matmul accumulators
                + 3 * qb * L * D * itemsize  # x/h hiddens
                + 2 * qb * L * D * itemsize  # out tile (double-buffered)
                + qb * L * 128 * itemsize)   # distogram one-hot
        if cost <= budget:
            return qb
    return None


def edge_embed_pallas(row_part, col_part, residue_idx, sc_ca,
                      krel, kd, k1, k2, b0, b1, b2, ln_scale, ln_bias,
                      *, min_bin: float, max_bin: float, num_bins: int,
                      init_embed_size: int, max_len: int = 2056,
                      self_conditioning: bool = True, eps: float = 1e-6,
                      query_block: int | None = None):
    """row_part/col_part: (B, L, D) rank-L first-layer contributions;
    residue_idx: (B, L) int; sc_ca: (B, L, 3) fp32;
    krel: (PE, D), kd: (NB, D), k1/k2: (D, D); biases/LN 1-D.
    Returns the (B, L, L, D) edge embedding in row_part.dtype."""
    B, L, D = row_part.shape
    dt = row_part.dtype
    qb = query_block or _pick_block(L, D, jnp.dtype(dt).itemsize)
    if qb is None:
        return edge_embed_reference(
            row_part, col_part, residue_idx, sc_ca, krel, kd, k1, k2,
            b0, b1, b2, ln_scale, ln_bias, min_bin=min_bin, max_bin=max_bin,
            num_bins=num_bins, init_embed_size=init_embed_size,
            max_len=max_len, self_conditioning=self_conditioning, eps=eps)

    half = init_embed_size // 2
    freq = math.pi / max_len ** (2 * jnp.arange(half, dtype=jnp.float32)
                                 / init_embed_size)
    lower = jnp.linspace(min_bin, max_bin, num_bins)
    upper = jnp.concatenate([lower[1:], jnp.asarray([1e8])])
    lo2 = (lower ** 2).reshape(1, -1)
    hi2 = (upper ** 2).reshape(1, -1)

    # Node-sized sinusoid tables; the kernel combines them pairwise via the
    # angle-addition identities.
    phase = residue_idx.astype(jnp.float32)[..., None] * freq  # (B, L, HPE)
    sin_p, cos_p = jnp.sin(phase), jnp.cos(phase)
    scf = sc_ca.astype(jnp.float32)

    PE, NB = krel.shape[0], kd.shape[0]
    vecs = [v.reshape(1, -1).astype(jnp.float32)
            for v in (b0, b1, b2, ln_scale, ln_bias)]

    kern = functools.partial(_kernel, self_cond=self_conditioning, eps=eps)
    return pl.pallas_call(
        kern,
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
        ],
        out_specs=pl.BlockSpec((1, qb, L, D), lambda b, i: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, L, L, D), dt),
    )(row_part, col_part, sin_p, cos_p, sin_p, cos_p, scf, scf,
      krel.astype(dt), kd.astype(dt), k1.astype(dt), k2.astype(dt),
      *vecs, lo2, hi2)


def edge_embed_reference(row_part, col_part, residue_idx, sc_ca,
                         krel, kd, k1, k2, b0, b1, b2, ln_scale, ln_bias,
                         *, min_bin: float, max_bin: float, num_bins: int,
                         init_embed_size: int, max_len: int = 2056,
                         self_conditioning: bool = True, eps: float = 1e-6,
                         query_block: int | None = None):
    """Plain-XLA oracle with identical inputs/outputs."""
    dt = row_part.dtype
    half = init_embed_size // 2
    freq = math.pi / max_len ** (2 * jnp.arange(half, dtype=jnp.float32)
                                 / init_embed_size)
    rel = (residue_idx[:, :, None] - residue_idx[:, None, :]).astype(jnp.float32)
    args = rel[..., None] * freq
    rel_embed = jnp.concatenate([jnp.sin(args), jnp.cos(args)], -1).astype(dt)
    x = jnp.einsum("bijc,cd->bijd", rel_embed, krel.astype(dt),
                   preferred_element_type=jnp.float32)

    if self_conditioning:
        d = jnp.linalg.norm(
            sc_ca[..., :, None, :].astype(jnp.float32)
            - sc_ca[..., None, :, :].astype(jnp.float32), axis=-1)
        lower = jnp.linspace(min_bin, max_bin, num_bins)
        upper = jnp.concatenate([lower[1:], jnp.asarray([1e8])])
        onehot = ((d[..., None] > lower) & (d[..., None] < upper)).astype(dt)
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


# ---- differentiable entry point --------------------------------------------

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
    _, vjp = jax.vjp(
        lambda *a: edge_embed_reference(
            *a, min_bin=min_bin, max_bin=max_bin, num_bins=num_bins,
            init_embed_size=init_embed_size, max_len=max_len,
            self_conditioning=self_conditioning), *saved)
    return vjp(ct)


edge_embed.defvjp(_ee_fwd, _ee_bwd)
