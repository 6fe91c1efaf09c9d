"""Fused edge-transition MLP as a Pallas TPU kernel.

The EdgeTransition trunk (reference layers.py:148) is, per edge (i, j):

    x   = [z_ij ; n_i ; n_j]                  (concat, width H)
    h1  = relu(x @ K1 + b1)
    h2  = relu(h1 @ K2 + b2)
    out = LayerNorm((h2 + x) @ Kf + bf)

Executed by XLA this materializes [B, L, L, H] hidden tensors in HBM — the
dominant memory traffic of the whole network. This kernel processes row
blocks of the edge matrix with all weights and hiddens resident in VMEM, so
HBM sees one read of z and one write of the output.

The rank-L node contributions (n_i / n_j through their kernel slices) are
precomputed outside at O(L) cost and broadcast-added inside.

Equivalence with the XLA path is tested in tests/test_pallas.py; callers fall
back to the XLA path off-TPU (`is_supported()`).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ._pallas_util import cp as _cp
from ._pallas_util import emit_proj as _emit_proj
from ._pallas_util import is_tpu as is_supported

# 16 measured fastest at B=8 L=256 bf16 (1.99 ms vs 2.08 at 8; 32 exceeds
# the scoped-VMEM limit).
DEFAULT_ROW_BLOCK = 16


def _quantize_rows(x2: jnp.ndarray):
    """Symmetric per-row int8 quantization of a (rows, K) fp32 tensor.
    Returns (int8 values, (rows, 1) fp32 dequant scale)."""
    s = (jnp.max(jnp.abs(x2), axis=-1, keepdims=True) * (1.0 / 127.0)
         + 1e-12)
    return jnp.round(x2 / s).astype(jnp.int8), s


def quantize_weight_cols(w: jnp.ndarray):
    """Symmetric per-OUTPUT-channel int8 weight quantization (host/XLA side).
    Returns (int8 (K, N), (1, N) fp32 dequant scale)."""
    wf = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(wf), axis=0, keepdims=True) / 127.0 + 1e-12
    return jnp.round(wf / s).astype(jnp.int8), s


def _forward_body(z_ref, ni1_ref, nj1_ref, nfi_ref, nfj_ref,
                  k1z_ref, k2_ref, kfh_ref, kfz_ref,
                  b1_ref, b2_ref, bf_ref, ln_scale_ref, ln_bias_ref,
                  eps: float, scale_refs=None):
    """Shared fused-MLP forward over one row block; returns the final
    LayerNorm output (R, L, Cout) in fp32.

    scale_refs: None for the bf16/fp32 MXU path. For the int8 path the
    weight refs hold per-output-channel int8 weights and scale_refs their
    (1, N) fp32 dequant scales; activations quantize per row in VMEM
    (symmetric absmax), so every dequant is the rank-1 product
    row_scale x col_scale — the MXU runs at the 394 TOPS int8 rate
    instead of 197 TFLOP/s bf16."""
    z = z_ref[0]                       # (R, L, Cz)
    R, L, Cz = z.shape
    z2 = z.reshape(R * L, Cz)
    int8 = scale_refs is not None

    if int8:
        s1_ref, s2_ref, sfh_ref, sfz_ref = scale_refs
        zq, za = _quantize_rows(z2.astype(jnp.float32))
        h = jax.lax.dot_general(zq, k1z_ref[:], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        h = h.astype(jnp.float32) * za * s1_ref[0]
    else:
        h = jnp.dot(z2, k1z_ref[:], preferred_element_type=jnp.float32)
    # Fold the bias row into the (R, H)-sized row term BEFORE broadcasting:
    # one fewer full-size VPU pass over the (R, L, H) hidden per add chain
    # (Mosaic lowers each elementwise op as its own VMEM pass).
    ni1b = ni1_ref[0] + b1_ref[0]
    h = h.reshape(R, L, -1) + ni1b[:, None, :] + nj1_ref[0][None, :, :]
    H = h.shape[-1]

    if int8:
        h = jnp.maximum(h, 0.0).reshape(R * L, H)
        hq, ha = _quantize_rows(h)
        h = jax.lax.dot_general(hq, k2_ref[:], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        h = jnp.maximum(h.astype(jnp.float32) * ha * s2_ref[0] + b2_ref[0],
                        0.0)
        h2q, h2a = _quantize_rows(h)
        o = (jax.lax.dot_general(h2q, kfh_ref[:], (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
             .astype(jnp.float32) * h2a * sfh_ref[0])
        o = o + (jax.lax.dot_general(zq, kfz_ref[:],
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.int32)
                 .astype(jnp.float32) * za * sfz_ref[0])
    else:
        h = jnp.maximum(h, 0.0).astype(z.dtype)
        h = jnp.dot(h.reshape(R * L, H), k2_ref[:],
                    preferred_element_type=jnp.float32)
        h = jnp.maximum(h + b2_ref[0], 0.0).astype(z.dtype)

        # (h2 + x) @ Kf == h2 @ Kf + z @ Kf_z + rank-L node parts.
        o = jnp.dot(h, kfh_ref[:], preferred_element_type=jnp.float32)
        o = o + jnp.dot(z2, kfz_ref[:], preferred_element_type=jnp.float32)
    Cout = o.shape[-1]
    nfib = nfi_ref[0] + bf_ref[0]
    o = o.reshape(R, L, Cout) + nfib[:, None, :] + nfj_ref[0][None, :, :]

    mean = jnp.mean(o, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(o - mean), axis=-1, keepdims=True)
    o = (o - mean) * jax.lax.rsqrt(var + eps)
    return o * ln_scale_ref[0] + ln_bias_ref[0]


def _kernel(z_ref, ni1_ref, nj1_ref, nfi_ref, nfj_ref,
            k1z_ref, k2_ref, kfh_ref, kfz_ref,
            b1_ref, b2_ref, bf_ref, ln_scale_ref, ln_bias_ref,
            out_ref, *, eps: float):
    o = _forward_body(z_ref, ni1_ref, nj1_ref, nfi_ref, nfj_ref,
                      k1z_ref, k2_ref, kfh_ref, kfz_ref,
                      b1_ref, b2_ref, bf_ref, ln_scale_ref, ln_bias_ref, eps)
    out_ref[0] = o.astype(out_ref.dtype)


def _kernel_proj(z_ref, ni1_ref, nj1_ref, nfi_ref, nfj_ref,
                 k1z_ref, k2_ref, kfh_ref, kfz_ref,
                 b1_ref, b2_ref, bf_ref, ln_scale_ref, ln_bias_ref,
                 wcatT_ref, bcat_ref,
                 out_ref, proj_ref, *, eps: float):
    """Edge-stack mega-fusion: additionally emit the NEXT IPA block's fused
    z projection proj[r, x, l] = sum_c out[r, l, c] * wcat[c, x] + bcat[x]
    while the freshly computed z' tile is still in VMEM — the consumer
    (ops/ipa_attention) then never reads z' at all. Emitted per row as
    wcatT (X, Cout) @ out[r]^T-free form: dot_general contracting the
    channel dim of both operands (Mosaic-fast contract-dim1/dim1)."""
    o = _forward_body(z_ref, ni1_ref, nj1_ref, nfi_ref, nfj_ref,
                      k1z_ref, k2_ref, kfh_ref, kfz_ref,
                      b1_ref, b2_ref, bf_ref, ln_scale_ref, ln_bias_ref, eps)
    oc = o.astype(out_ref.dtype)
    out_ref[0] = oc
    _emit_proj(oc, wcatT_ref, bcat_ref, proj_ref)


def _kernel_proj_only(z_ref, ni1_ref, nj1_ref, nfi_ref, nfj_ref,
                      k1z_ref, k2_ref, kfh_ref, kfz_ref,
                      b1_ref, b2_ref, bf_ref, ln_scale_ref, ln_bias_ref,
                      wcatT_ref, bcat_ref,
                      proj_ref, *, eps: float):
    """Mega-fusion tail variant: emit ONLY the next block's fused z
    projection. Used for the LAST EdgeTransition, whose z' output is dead
    under mega-fusion (the final IPA block consumes proj, nothing reads
    z'), so the full [B, L, L, Cout] HBM write is skipped entirely."""
    o = _forward_body(z_ref, ni1_ref, nj1_ref, nfi_ref, nfj_ref,
                      k1z_ref, k2_ref, kfh_ref, kfz_ref,
                      b1_ref, b2_ref, bf_ref, ln_scale_ref, ln_bias_ref, eps)
    _emit_proj(o, wcatT_ref, bcat_ref, proj_ref)


def _kernel_int8(z_ref, ni1_ref, nj1_ref, nfi_ref, nfj_ref,
                 k1z_ref, k2_ref, kfh_ref, kfz_ref,
                 b1_ref, b2_ref, bf_ref, ln_scale_ref, ln_bias_ref,
                 s1_ref, s2_ref, sfh_ref, sfz_ref,
                 out_ref, *, eps: float):
    o = _forward_body(z_ref, ni1_ref, nj1_ref, nfi_ref, nfj_ref,
                      k1z_ref, k2_ref, kfh_ref, kfz_ref,
                      b1_ref, b2_ref, bf_ref, ln_scale_ref, ln_bias_ref, eps,
                      scale_refs=(s1_ref, s2_ref, sfh_ref, sfz_ref))
    out_ref[0] = o.astype(out_ref.dtype)


def _kernel_proj_int8(z_ref, ni1_ref, nj1_ref, nfi_ref, nfj_ref,
                      k1z_ref, k2_ref, kfh_ref, kfz_ref,
                      b1_ref, b2_ref, bf_ref, ln_scale_ref, ln_bias_ref,
                      s1_ref, s2_ref, sfh_ref, sfz_ref,
                      wcatT_ref, bcat_ref,
                      out_ref, proj_ref, *, eps: float):
    o = _forward_body(z_ref, ni1_ref, nj1_ref, nfi_ref, nfj_ref,
                      k1z_ref, k2_ref, kfh_ref, kfz_ref,
                      b1_ref, b2_ref, bf_ref, ln_scale_ref, ln_bias_ref, eps,
                      scale_refs=(s1_ref, s2_ref, sfh_ref, sfz_ref))
    oc = o.astype(out_ref.dtype)
    out_ref[0] = oc
    _emit_proj(oc, wcatT_ref, bcat_ref, proj_ref)


def _kernel_proj_only_int8(z_ref, ni1_ref, nj1_ref, nfi_ref, nfj_ref,
                           k1z_ref, k2_ref, kfh_ref, kfz_ref,
                           b1_ref, b2_ref, bf_ref, ln_scale_ref, ln_bias_ref,
                           s1_ref, s2_ref, sfh_ref, sfz_ref,
                           wcatT_ref, bcat_ref,
                           proj_ref, *, eps: float):
    o = _forward_body(z_ref, ni1_ref, nj1_ref, nfi_ref, nfj_ref,
                      k1z_ref, k2_ref, kfh_ref, kfz_ref,
                      b1_ref, b2_ref, bf_ref, ln_scale_ref, ln_bias_ref, eps,
                      scale_refs=(s1_ref, s2_ref, sfh_ref, sfz_ref))
    _emit_proj(o, wcatT_ref, bcat_ref, proj_ref)


def edge_mlp_pallas(z, ni1, nj1, nfi, nfj, k1z, k2, kfh, kfz,
                    b1, b2, bf, ln_scale, ln_bias,
                    eps: float = 1e-6,
                    row_block: int = DEFAULT_ROW_BLOCK,
                    proj_w=None, need_out: bool = True,
                    int8_dots: bool = False):
    """Fused edge MLP.

    z: (B, L, L, Cz); ni1/nj1: (B, L, H); nfi/nfj: (B, L, Cout);
    kernels pre-sliced: k1z (Cz, H), k2 (H, H), kfh (H, Cout), kfz (Cz, Cout);
    biases/LN params 1-D. Returns (B, L, L, Cout) in z.dtype.

    proj_w: optional (wcatT (X, Cout), bcat (X,)) — the NEXT IPA block's
    fused z-projection weights. When given, the kernel additionally emits
    proj (B, L, X, L) while the output tile is in VMEM (edge-stack
    mega-fusion: the consumer never reads z' from HBM) and the return value
    is the tuple (out, proj). With need_out=False (valid only with proj_w)
    the z' HBM write is skipped too and ONLY proj is returned — the
    configuration of the last EdgeTransition, whose z' is dead.

    Rectangular inputs are supported: z may be (B, Lr, Lc, Cz) with
    nj1/nfj holding the Lc column-side node parts — the sequence-sharded
    trunk (parallel/seq_shard.py) calls with each device's column shard.

    int8_dots=True quantizes the four trunk matmuls to int8 (per-output-
    channel weight scales computed here; per-row activation scales in
    VMEM) — the MXU's 394 TOPS int8 rate vs 197 TFLOP/s bf16. INFERENCE
    ONLY: the int8 path defines no VJP (training keeps the bf16 kernels).
    """
    B, Lr, Lc, Cz = z.shape
    H = k2.shape[0]
    Cout = kfh.shape[1]
    rb = min(row_block, Lr)
    while Lr % rb:
        rb -= 1

    dt = z.dtype
    ni1, nj1 = ni1.astype(jnp.float32), nj1.astype(jnp.float32)
    nfi, nfj = nfi.astype(jnp.float32), nfj.astype(jnp.float32)
    vecs = [v.reshape(1, -1).astype(jnp.float32)
            for v in (b1, b2, bf, ln_scale, ln_bias)]
    if int8_dots:
        qw = [quantize_weight_cols(w) for w in (k1z, k2, kfh, kfz)]
        weights = [q for q, _ in qw]
        scale_args = [s for _, s in qw]
        scale_specs = [
            pl.BlockSpec((1, H), lambda b, i: (0, 0)),
            pl.BlockSpec((1, H), lambda b, i: (0, 0)),
            pl.BlockSpec((1, Cout), lambda b, i: (0, 0)),
            pl.BlockSpec((1, Cout), lambda b, i: (0, 0)),
        ]
        kerns = (_kernel_int8, _kernel_proj_int8, _kernel_proj_only_int8)
    else:
        weights = [w.astype(dt) for w in (k1z, k2, kfh, kfz)]
        scale_args, scale_specs = [], []
        kerns = (_kernel, _kernel_proj, _kernel_proj_only)

    in_specs = [
        pl.BlockSpec((1, rb, Lc, Cz), lambda b, i: (b, i, 0, 0)),
        pl.BlockSpec((1, rb, H), lambda b, i: (b, i, 0)),
        pl.BlockSpec((1, Lc, H), lambda b, i: (b, 0, 0)),
        pl.BlockSpec((1, rb, Cout), lambda b, i: (b, i, 0)),
        pl.BlockSpec((1, Lc, Cout), lambda b, i: (b, 0, 0)),
        pl.BlockSpec((Cz, H), lambda b, i: (0, 0)),
        pl.BlockSpec((H, H), lambda b, i: (0, 0)),
        pl.BlockSpec((H, Cout), lambda b, i: (0, 0)),
        pl.BlockSpec((Cz, Cout), lambda b, i: (0, 0)),
        pl.BlockSpec((1, H), lambda b, i: (0, 0)),
        pl.BlockSpec((1, H), lambda b, i: (0, 0)),
        pl.BlockSpec((1, Cout), lambda b, i: (0, 0)),
        pl.BlockSpec((1, Cout), lambda b, i: (0, 0)),
        pl.BlockSpec((1, Cout), lambda b, i: (0, 0)),
        *scale_specs,
    ]
    args = [z, ni1, nj1, nfi, nfj, *weights, *vecs, *scale_args]

    if proj_w is None:
        return pl.pallas_call(
            functools.partial(kerns[0], eps=eps),
            compiler_params=_cp(32 * 1024 * 1024),
            grid=(B, Lr // rb),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, rb, Lc, Cout), lambda b, i: (b, i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, Lr, Lc, Cout), dt),
        )(*args)

    wcatT, bcat = proj_w
    X = wcatT.shape[0]
    in_specs += [
        pl.BlockSpec((X, Cout), lambda b, i: (0, 0)),
        pl.BlockSpec((1, X), lambda b, i: (0, 0)),
    ]
    args += [wcatT.astype(dt), bcat.reshape(1, -1).astype(jnp.float32)]
    if not need_out:
        return pl.pallas_call(
            functools.partial(kerns[2], eps=eps),
            compiler_params=_cp(32 * 1024 * 1024),
            grid=(B, Lr // rb),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, rb, X, Lc), lambda b, i: (b, i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, Lr, X, Lc), dt),
        )(*args)
    return pl.pallas_call(
        functools.partial(kerns[1], eps=eps),
        compiler_params=_cp(32 * 1024 * 1024),
        grid=(B, Lr // rb),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, rb, Lc, Cout), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, rb, X, Lc), lambda b, i: (b, i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Lr, Lc, Cout), dt),
            jax.ShapeDtypeStruct((B, Lr, X, Lc), dt),
        ],
    )(*args)


# ---- hand-written backward kernel ------------------------------------------
# Recomputes the forward hiddens for a row block entirely in VMEM (storing
# nothing between fwd and bwd but the kernel's own inputs), then walks the
# chain LN -> final -> relu MLP backwards. Per-row-block outputs (d_z,
# d_ni1, d_nfi) are block-indexed; everything contracted over rows (d_nj1,
# d_nfj, all weight/bias/LN grads) accumulates into fp32 output blocks that
# are revisited across the sequential row-block grid axis.

def _bwd_body(z_ref, ni1_ref, nj1_ref, nfi_ref, nfj_ref,
              k1z_ref, k2_ref, kfh_ref, kfz_ref,
              b1_ref, b2_ref, bf_ref, ln_scale_ref, ln_bias_ref,
              dout_ref,
              dz_ref, dni1_ref, dnj1_ref, dnfi_ref, dnfj_ref,
              dk1z_ref, dk2_ref, dkfh_ref, dkfz_ref,
              db1_ref, db2_ref, dbf_ref, dls_ref, dlb_ref,
              proj_pack, eps: float):
    """proj_pack: None, or (wcatT_ref, dprojT_ref, dwcatT_ref, dbcat_ref)
    for the mega-fusion variant whose forward also emitted the next block's
    fused z projection."""
    # Per-batch accumulators (dnj1/dnfj, block index (b,0,0)) restart at the
    # first row block of every batch row; the weight-like accumulators keep
    # block index (0,0) for the WHOLE grid (the block persists in VMEM and is
    # flushed once at the end), so they are zeroed only at the very first
    # program.
    first_in_batch = pl.program_id(1) == 0
    first_overall = (pl.program_id(0) == 0) & first_in_batch

    @pl.when(first_in_batch)
    def _zero_batch():
        dnj1_ref[...] = jnp.zeros(dnj1_ref.shape, dnj1_ref.dtype)
        dnfj_ref[...] = jnp.zeros(dnfj_ref.shape, dnfj_ref.dtype)

    @pl.when(first_overall)
    def _zero_weights():
        refs = [dk1z_ref, dk2_ref, dkfh_ref, dkfz_ref,
                db1_ref, db2_ref, dbf_ref, dls_ref, dlb_ref]
        if proj_pack is not None:
            refs += [proj_pack[2], proj_pack[3]]
        for ref in refs:
            ref[...] = jnp.zeros(ref.shape, ref.dtype)

    z = z_ref[0]                        # (R, L, Cz)
    R, L, Cz = z.shape
    H = k2_ref.shape[0]
    dt = z.dtype
    z2 = z.reshape(R * L, Cz)

    # ---- recompute forward hiddens (identical math to _kernel) ----------
    x = jnp.dot(z2, k1z_ref[:], preferred_element_type=jnp.float32)
    ni1b = ni1_ref[0] + b1_ref[0]
    x = x.reshape(R, L, H) + ni1b[:, None, :] + nj1_ref[0][None, :, :]
    h1 = jnp.maximum(x, 0.0).astype(dt)                  # (R, L, H)
    h1_2 = h1.reshape(R * L, H)

    h2 = jnp.dot(h1_2, k2_ref[:], preferred_element_type=jnp.float32)
    h2 = jnp.maximum(h2 + b2_ref[0], 0.0).astype(dt)     # (R*L, H)

    y = jnp.dot(h2, kfh_ref[:], preferred_element_type=jnp.float32)
    y = y + jnp.dot(z2, kfz_ref[:], preferred_element_type=jnp.float32)
    Cout = y.shape[-1]
    nfib = nfi_ref[0] + bf_ref[0]
    y = y.reshape(R, L, Cout) + nfib[:, None, :] + nfj_ref[0][None, :, :]
    mean = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (y - mean) * rstd                             # (R, L, Cout) f32

    # ---- LayerNorm backward --------------------------------------------
    if dout_ref is None:
        # proj-only forward (the last EdgeTransition): out itself is not an
        # output, so its cotangent is exactly the proj fold-in below.
        dout = jnp.zeros((R, L, Cout), jnp.float32)
    else:
        dout = dout_ref[0].astype(jnp.float32)           # (R, L, Cout)
    if proj_pack is not None:
        # Forward also emitted proj = out @ wcat + bcat: fold its cotangent
        # into the out-cotangent and accumulate the projection-weight grads.
        wcatT_ref, dprojT_ref, dwcatT_ref, dbcat_ref = proj_pack
        wT = wcatT_ref[:].astype(dt)                     # (X, Cout)
        X = wT.shape[0]
        o_dt = (xhat * ln_scale_ref[0] + ln_bias_ref[0]).astype(dt)
        dprojT = dprojT_ref[0]                           # (R, L, X) dt
        extra = []
        for r in range(R):
            extra.append(jnp.dot(dprojT[r], wT,
                                 preferred_element_type=jnp.float32))
        dout = dout + jnp.stack(extra, axis=0)           # (R, L, Cout)
        dpT2 = dprojT.reshape(R * L, X)
        dwcatT_ref[...] += jax.lax.dot_general(
            dpT2, o_dt.reshape(R * L, Cout), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (X, Cout)
        dbcat_ref[...] += jnp.sum(dpT2.astype(jnp.float32), axis=0,
                                  keepdims=True)
    dls_ref[...] += jnp.sum((dout * xhat).reshape(R * L, Cout), axis=0,
                            keepdims=True)
    dlb_ref[...] += jnp.sum(dout.reshape(R * L, Cout), axis=0, keepdims=True)
    g = dout * ln_scale_ref[0]
    dy = (g - jnp.mean(g, axis=-1, keepdims=True)
          - xhat * jnp.mean(g * xhat, axis=-1, keepdims=True)) * rstd
    dy2 = dy.reshape(R * L, Cout)
    dyc = dy2.astype(dt)

    dnfi_ref[0] = jnp.sum(dy, axis=1).astype(dnfi_ref.dtype)   # (R, Cout)
    dnfj_ref[0] += jnp.sum(dy, axis=0)                         # (L, Cout)
    dbf_ref[...] += jnp.sum(dy2, axis=0, keepdims=True)

    # ---- final linear backward -----------------------------------------
    # d_h2 = d_y @ Kf_h^T   (contract-dim1/dim1)
    dh2 = jax.lax.dot_general(dyc, kfh_ref[:], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    # f32 compare: Mosaic on this target rejects bf16 comparisons
    dh2 = jnp.where(h2.astype(jnp.float32) > 0.0, dh2, 0.0)
    dh2c = dh2.astype(dt)
    db2_ref[...] += jnp.sum(dh2, axis=0, keepdims=True)
    # d_Kf_h += h2^T @ d_y  (contract rows)
    dkfh_ref[...] += jax.lax.dot_general(
        h2, dyc, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dkfz_ref[...] += jax.lax.dot_general(
        z2, dyc, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    # ---- second trunk layer backward -----------------------------------
    dh1 = jax.lax.dot_general(dh2c, k2_ref[:], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dh1 = jnp.where(h1_2.astype(jnp.float32) > 0.0, dh1, 0.0)
    dh1c = dh1.astype(dt)
    db1_ref[...] += jnp.sum(dh1, axis=0, keepdims=True)
    dk2_ref[...] += jax.lax.dot_general(
        h1_2, dh2c, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dni1_ref[0] = jnp.sum(dh1.reshape(R, L, H), axis=1).astype(dni1_ref.dtype)
    dnj1_ref[0] += jnp.sum(dh1.reshape(R, L, H), axis=0)

    # ---- first trunk layer backward ------------------------------------
    dk1z_ref[...] += jax.lax.dot_general(
        z2, dh1c, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dz = jax.lax.dot_general(dh1c, k1z_ref[:], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dz = dz + jax.lax.dot_general(dyc, kfz_ref[:], (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    dz_ref[0] = dz.reshape(R, L, Cz).astype(dz_ref.dtype)


def _bwd_kernel(*refs, eps: float):
    _bwd_body(*refs, None, eps)


def _bwd_kernel_proj(*refs, eps: float):
    (z, ni1, nj1, nfi, nfj, k1z, k2, kfh, kfz, b1, b2, bf, lns, lnb,
     dout, wcatT, dprojT,
     dz, dni1, dnj1, dnfi, dnfj, dk1z, dk2, dkfh, dkfz, db1, db2, dbf,
     dls, dlb, dwcatT, dbcat) = refs
    _bwd_body(z, ni1, nj1, nfi, nfj, k1z, k2, kfh, kfz, b1, b2, bf, lns, lnb,
              dout, dz, dni1, dnj1, dnfi, dnfj, dk1z, dk2, dkfh, dkfz,
              db1, db2, dbf, dls, dlb,
              (wcatT, dprojT, dwcatT, dbcat), eps)


def _bwd_kernel_proj_nodout(*refs, eps: float):
    (z, ni1, nj1, nfi, nfj, k1z, k2, kfh, kfz, b1, b2, bf, lns, lnb,
     wcatT, dprojT,
     dz, dni1, dnj1, dnfi, dnfj, dk1z, dk2, dkfh, dkfz, db1, db2, dbf,
     dls, dlb, dwcatT, dbcat) = refs
    _bwd_body(z, ni1, nj1, nfi, nfj, k1z, k2, kfh, kfz, b1, b2, bf, lns, lnb,
              None, dz, dni1, dnj1, dnfi, dnfj, dk1z, dk2, dkfh, dkfz,
              db1, db2, dbf, dls, dlb,
              (wcatT, dprojT, dwcatT, dbcat), eps)


def _pick_bwd_row_block(Lr: int, Lc: int, Cz: int, H: int, Cout: int,
                        itemsize: int):
    """Largest row block whose backward working set fits scoped VMEM.
    Candidates stay multiples of 8 (Mosaic block-shape constraint on the
    (1, rb, H) node-grad blocks) unless rb == Lr (full-dim blocks).
    Returns None when even the smallest block exceeds the raised scoped
    limit (the caller then differentiates the XLA reference instead of
    hard-failing at Mosaic compile — e.g. unsharded L >= 1024)."""
    budget = 13 * 1024 * 1024
    hard_budget = 56 * 1024 * 1024   # under the 64 MB raised scoped limit
    fixed = ((Lc * H + Lc * Cout) * 4 * 2    # nj1/nfj in + dnj1/dnfj accum
             + (Cz * H + H * H + H * Cout + Cz * Cout) * (itemsize + 4))

    def per(rb):
        return (2 * rb * Lc * Cz * itemsize      # z block (double-buffered)
                + 2 * rb * Lc * Cout * itemsize  # dout block
                + 2 * rb * Lc * Cz * itemsize    # dz out
                + 2 * rb * Lc * H * itemsize     # h1, h2 (dt)
                + 6 * rb * Lc * Cout * 4         # y/xhat/dout/g/dy f32
                + 3 * rb * Lc * H * 4)           # dh1/dh2 f32 (liveness)

    for rb in (16, 8):
        if Lr % rb and rb != Lr:
            continue
        if fixed + per(rb) <= budget:
            return rb
    rb = 8 if Lr % 8 == 0 else Lr
    if fixed + per(rb) <= hard_budget:
        return rb
    return None


def edge_mlp_bwd_pallas(z, ni1, nj1, nfi, nfj, k1z, k2, kfh, kfz,
                        b1, b2, bf, ln_scale, ln_bias, dout,
                        eps: float = 1e-6, row_block: int | None = None,
                        proj_w=None, dproj=None):
    """Hand-written backward. Returns grads for every input of
    `edge_mlp_pallas` (in order); with proj_w/dproj given, additionally
    (dwcatT, dbcat) appended. dout may be None (proj-only forward: the
    last EdgeTransition) — then the dout HBM read is skipped entirely and
    the out-cotangent is the proj fold-in alone."""
    B, Lr, Lc, Cz = z.shape
    H = k2.shape[0]
    Cout = kfh.shape[1]
    dt = z.dtype
    rb = row_block or _pick_bwd_row_block(Lr, Lc, Cz, H, Cout,
                                          jnp.dtype(dt).itemsize)
    if rb is None:
        # Working set exceeds the raised scoped-VMEM limit even at the
        # smallest block: signal the caller to differentiate the XLA
        # reference instead.
        return None
    rb = min(rb, Lr)
    while Lr % rb:
        rb -= 1

    ni1, nj1 = ni1.astype(jnp.float32), nj1.astype(jnp.float32)
    nfi, nfj = nfi.astype(jnp.float32), nfj.astype(jnp.float32)
    vecs = [v.reshape(1, -1).astype(jnp.float32)
            for v in (b1, b2, bf, ln_scale, ln_bias)]
    weights = [w.astype(dt) for w in (k1z, k2, kfh, kfz)]
    f32 = jnp.float32

    fixed_w = [  # weight-like inputs, block = whole array
        pl.BlockSpec((Cz, H), lambda b, i: (0, 0)),
        pl.BlockSpec((H, H), lambda b, i: (0, 0)),
        pl.BlockSpec((H, Cout), lambda b, i: (0, 0)),
        pl.BlockSpec((Cz, Cout), lambda b, i: (0, 0)),
        pl.BlockSpec((1, H), lambda b, i: (0, 0)),
        pl.BlockSpec((1, H), lambda b, i: (0, 0)),
        pl.BlockSpec((1, Cout), lambda b, i: (0, 0)),
        pl.BlockSpec((1, Cout), lambda b, i: (0, 0)),
        pl.BlockSpec((1, Cout), lambda b, i: (0, 0)),
    ]
    in_specs = [
        pl.BlockSpec((1, rb, Lc, Cz), lambda b, i: (b, i, 0, 0)),
        pl.BlockSpec((1, rb, H), lambda b, i: (b, i, 0)),
        pl.BlockSpec((1, Lc, H), lambda b, i: (b, 0, 0)),
        pl.BlockSpec((1, rb, Cout), lambda b, i: (b, i, 0)),
        pl.BlockSpec((1, Lc, Cout), lambda b, i: (b, 0, 0)),
        *fixed_w,
    ]
    args = [z, ni1, nj1, nfi, nfj, *weights, *vecs]
    if dout is not None:
        in_specs.append(pl.BlockSpec((1, rb, Lc, Cout),
                                     lambda b, i: (b, i, 0, 0)))
        args.append(dout.astype(dt))
    extra_out_specs, extra_out_shapes = [], []
    kern = _bwd_kernel
    if proj_w is not None:
        kern = _bwd_kernel_proj if dout is not None else _bwd_kernel_proj_nodout
        wcatT, _bcat = proj_w
        X = wcatT.shape[0]
        # dproj arrives (B, Lr, X, Lc); the kernel wants the (B, Lr, Lc, X)
        # transpose so the per-row fold-in matmul is natural (M,K)x(K,N).
        dprojT = dproj.astype(dt).transpose(0, 1, 3, 2)
        in_specs += [
            pl.BlockSpec((X, Cout), lambda b, i: (0, 0)),
            pl.BlockSpec((1, rb, Lc, X), lambda b, i: (b, i, 0, 0)),
        ]
        args += [wcatT.astype(dt), dprojT]
        extra_out_specs = [
            pl.BlockSpec((X, Cout), lambda b, i: (0, 0)),
            pl.BlockSpec((1, X), lambda b, i: (0, 0)),
        ]
        extra_out_shapes = [
            jax.ShapeDtypeStruct((X, Cout), f32),          # dwcatT (accum)
            jax.ShapeDtypeStruct((1, X), f32),             # dbcat (accum)
        ]
    outs = pl.pallas_call(
        functools.partial(kern, eps=eps),
        compiler_params=_cp(64 * 1024 * 1024),
        grid=(B, Lr // rb),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, rb, Lc, Cz), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, rb, H), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, Lc, H), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, rb, Cout), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, Lc, Cout), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((Cz, H), lambda b, i: (0, 0)),
            pl.BlockSpec((H, H), lambda b, i: (0, 0)),
            pl.BlockSpec((H, Cout), lambda b, i: (0, 0)),
            pl.BlockSpec((Cz, Cout), lambda b, i: (0, 0)),
            pl.BlockSpec((1, H), lambda b, i: (0, 0)),
            pl.BlockSpec((1, H), lambda b, i: (0, 0)),
            pl.BlockSpec((1, Cout), lambda b, i: (0, 0)),
            pl.BlockSpec((1, Cout), lambda b, i: (0, 0)),
            pl.BlockSpec((1, Cout), lambda b, i: (0, 0)),
            *extra_out_specs,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Lr, Lc, Cz), dt),     # dz
            jax.ShapeDtypeStruct((B, Lr, H), f32),         # dni1
            jax.ShapeDtypeStruct((B, Lc, H), f32),         # dnj1 (accum)
            jax.ShapeDtypeStruct((B, Lr, Cout), f32),      # dnfi
            jax.ShapeDtypeStruct((B, Lc, Cout), f32),      # dnfj (accum)
            jax.ShapeDtypeStruct((Cz, H), f32),            # dk1z (accum)
            jax.ShapeDtypeStruct((H, H), f32),             # dk2 (accum)
            jax.ShapeDtypeStruct((H, Cout), f32),          # dkfh (accum)
            jax.ShapeDtypeStruct((Cz, Cout), f32),         # dkfz (accum)
            jax.ShapeDtypeStruct((1, H), f32),             # db1 (accum)
            jax.ShapeDtypeStruct((1, H), f32),             # db2 (accum)
            jax.ShapeDtypeStruct((1, Cout), f32),          # dbf (accum)
            jax.ShapeDtypeStruct((1, Cout), f32),          # dls (accum)
            jax.ShapeDtypeStruct((1, Cout), f32),          # dlb (accum)
            *extra_out_shapes,
        ],
    )(*args)
    return outs


# ---- differentiable entry point --------------------------------------------
# Forward AND backward run hand-written Pallas kernels: the backward
# recomputes the [B,L,L,H] hiddens in VMEM instead of materializing them in
# HBM (or, as in round 2, re-running the XLA oracle forward inside the VJP).

@jax.custom_vjp
def edge_mlp(z, ni1, nj1, nfi, nfj, k1z, k2, kfh, kfz,
             b1, b2, bf, ln_scale, ln_bias):
    return edge_mlp_pallas(z, ni1, nj1, nfi, nfj, k1z, k2, kfh, kfz,
                           b1, b2, bf, ln_scale, ln_bias)


def _edge_mlp_fwd(*args):
    return edge_mlp_pallas(*args), args


def _edge_mlp_bwd(args, ct):
    (z, ni1, nj1, nfi, nfj, k1z, k2, kfh, kfz,
     b1, b2, bf, ln_scale, ln_bias) = args
    outs = edge_mlp_bwd_pallas(z, ni1, nj1, nfi, nfj, k1z, k2, kfh, kfz,
                               b1, b2, bf, ln_scale, ln_bias, ct)
    if outs is None:
        # Shapes outside the backward kernel's VMEM envelope:
        # differentiate the XLA reference instead.
        _, vjp = jax.vjp(edge_mlp_reference, *args)
        return vjp(ct)
    (dz, dni1, dnj1, dnfi, dnfj, dk1z, dk2, dkfh, dkfz,
     db1, db2, dbf, dls, dlb) = outs
    return (dz.astype(z.dtype),
            dni1.astype(ni1.dtype), dnj1.astype(nj1.dtype),
            dnfi.astype(nfi.dtype), dnfj.astype(nfj.dtype),
            dk1z.astype(k1z.dtype), dk2.astype(k2.dtype),
            dkfh.astype(kfh.dtype), dkfz.astype(kfz.dtype),
            db1.reshape(b1.shape).astype(b1.dtype),
            db2.reshape(b2.shape).astype(b2.dtype),
            dbf.reshape(bf.shape).astype(bf.dtype),
            dls.reshape(ln_scale.shape).astype(ln_scale.dtype),
            dlb.reshape(ln_bias.shape).astype(ln_bias.dtype))


edge_mlp.defvjp(_edge_mlp_fwd, _edge_mlp_bwd)


# ---- mega-fusion variant: emit the next block's fused z projection ---------

@jax.custom_vjp
def edge_mlp_proj(z, ni1, nj1, nfi, nfj, k1z, k2, kfh, kfz,
                  b1, b2, bf, ln_scale, ln_bias, wcatT, bcat):
    return edge_mlp_pallas(z, ni1, nj1, nfi, nfj, k1z, k2, kfh, kfz,
                           b1, b2, bf, ln_scale, ln_bias,
                           proj_w=(wcatT, bcat))


def _edge_mlp_proj_fwd(*args):
    out, proj = edge_mlp_pallas(*args[:14], proj_w=(args[14], args[15]))
    return (out, proj), args


def _edge_mlp_proj_bwd(args, cts):
    (z, ni1, nj1, nfi, nfj, k1z, k2, kfh, kfz,
     b1, b2, bf, ln_scale, ln_bias, wcatT, bcat) = args
    dout, dproj = cts
    outs = edge_mlp_bwd_pallas(z, ni1, nj1, nfi, nfj, k1z, k2, kfh, kfz,
                               b1, b2, bf, ln_scale, ln_bias, dout,
                               proj_w=(wcatT, bcat), dproj=dproj)
    if outs is None:
        _, vjp = jax.vjp(edge_mlp_proj_reference, *args)
        return vjp(cts)
    (dz, dni1, dnj1, dnfi, dnfj, dk1z, dk2, dkfh, dkfz,
     db1, db2, dbf, dls, dlb, dwcatT, dbcat) = outs
    return (dz.astype(z.dtype),
            dni1.astype(ni1.dtype), dnj1.astype(nj1.dtype),
            dnfi.astype(nfi.dtype), dnfj.astype(nfj.dtype),
            dk1z.astype(k1z.dtype), dk2.astype(k2.dtype),
            dkfh.astype(kfh.dtype), dkfz.astype(kfz.dtype),
            db1.reshape(b1.shape).astype(b1.dtype),
            db2.reshape(b2.shape).astype(b2.dtype),
            dbf.reshape(bf.shape).astype(bf.dtype),
            dls.reshape(ln_scale.shape).astype(ln_scale.dtype),
            dlb.reshape(ln_bias.shape).astype(ln_bias.dtype),
            dwcatT.astype(wcatT.dtype),
            dbcat.reshape(bcat.shape).astype(bcat.dtype))


edge_mlp_proj.defvjp(_edge_mlp_proj_fwd, _edge_mlp_proj_bwd)


# ---- proj-only variant: the last EdgeTransition -----------------------------
# Under mega-fusion the final IPA block consumes proj and nothing ever reads
# the last transition's z', so its forward skips the [B, L, L, Cout] HBM
# write and its backward skips the matching dead-dout read.

@jax.custom_vjp
def edge_mlp_proj_only(z, ni1, nj1, nfi, nfj, k1z, k2, kfh, kfz,
                       b1, b2, bf, ln_scale, ln_bias, wcatT, bcat):
    return edge_mlp_pallas(z, ni1, nj1, nfi, nfj, k1z, k2, kfh, kfz,
                           b1, b2, bf, ln_scale, ln_bias,
                           proj_w=(wcatT, bcat), need_out=False)


def _edge_mlp_proj_only_fwd(*args):
    proj = edge_mlp_pallas(*args[:14], proj_w=(args[14], args[15]),
                           need_out=False)
    return proj, args


def _edge_mlp_proj_only_bwd(args, dproj):
    (z, ni1, nj1, nfi, nfj, k1z, k2, kfh, kfz,
     b1, b2, bf, ln_scale, ln_bias, wcatT, bcat) = args
    outs = edge_mlp_bwd_pallas(z, ni1, nj1, nfi, nfj, k1z, k2, kfh, kfz,
                               b1, b2, bf, ln_scale, ln_bias, None,
                               proj_w=(wcatT, bcat), dproj=dproj)
    if outs is None:
        _, vjp = jax.vjp(edge_mlp_proj_only_reference, *args)
        return vjp(dproj)
    (dz, dni1, dnj1, dnfi, dnfj, dk1z, dk2, dkfh, dkfz,
     db1, db2, dbf, dls, dlb, dwcatT, dbcat) = outs
    return (dz.astype(z.dtype),
            dni1.astype(ni1.dtype), dnj1.astype(nj1.dtype),
            dnfi.astype(nfi.dtype), dnfj.astype(nfj.dtype),
            dk1z.astype(k1z.dtype), dk2.astype(k2.dtype),
            dkfh.astype(kfh.dtype), dkfz.astype(kfz.dtype),
            db1.reshape(b1.shape).astype(b1.dtype),
            db2.reshape(b2.shape).astype(b2.dtype),
            dbf.reshape(bf.shape).astype(bf.dtype),
            dls.reshape(ln_scale.shape).astype(ln_scale.dtype),
            dlb.reshape(ln_bias.shape).astype(ln_bias.dtype),
            dwcatT.astype(wcatT.dtype),
            dbcat.reshape(bcat.shape).astype(bcat.dtype))


edge_mlp_proj_only.defvjp(_edge_mlp_proj_only_fwd, _edge_mlp_proj_only_bwd)


def edge_mlp_proj_only_reference(z, ni1, nj1, nfi, nfj, k1z, k2, kfh, kfz,
                                 b1, b2, bf, ln_scale, ln_bias, wcatT, bcat,
                                 eps: float = 1e-6):
    """XLA oracle for the proj-only variant."""
    _, proj = edge_mlp_proj_reference(z, ni1, nj1, nfi, nfj, k1z, k2, kfh,
                                      kfz, b1, b2, bf, ln_scale, ln_bias,
                                      wcatT, bcat, eps=eps)
    return proj


def edge_mlp_proj_reference(z, ni1, nj1, nfi, nfj, k1z, k2, kfh, kfz,
                            b1, b2, bf, ln_scale, ln_bias, wcatT, bcat,
                            eps: float = 1e-6):
    """XLA oracle for the mega-fusion variant: edge MLP + the next block's
    fused z projection proj[b,i,x,l] = sum_c out[b,i,l,c]*wcat[c,x]+bcat[x]."""
    out = edge_mlp_reference(z, ni1, nj1, nfi, nfj, k1z, k2, kfh, kfz,
                             b1, b2, bf, ln_scale, ln_bias, eps=eps)
    dt = out.dtype
    proj = (jnp.einsum("bilc,xc->bixl", out, wcatT.astype(dt))
            .astype(jnp.float32) + bcat.astype(jnp.float32)[None, None, :, None])
    return out, proj.astype(dt)


def edge_mlp_reference(z, ni1, nj1, nfi, nfj, k1z, k2, kfh, kfz,
                       b1, b2, bf, ln_scale, ln_bias,
                       eps: float = 1e-6) -> jnp.ndarray:
    """Plain-XLA equivalent (also the numerical oracle for tests)."""
    dt = z.dtype
    h = jnp.einsum("blmc,cd->blmd", z, k1z.astype(dt))
    h = h + ni1[:, :, None, :] + nj1[:, None, :, :] + b1
    h = jnp.maximum(h, 0.0).astype(dt)
    h = jnp.einsum("blmc,cd->blmd", h, k2.astype(dt)) + b2
    h = jnp.maximum(h, 0.0).astype(dt)
    o = jnp.einsum("blmc,cd->blmd", h, kfh.astype(dt))
    o = o + jnp.einsum("blmc,cd->blmd", z, kfz.astype(dt))
    o = o + nfi[:, :, None, :] + nfj[:, None, :, :] + bf
    o = o.astype(jnp.float32)
    mean = jnp.mean(o, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(o - mean), axis=-1, keepdims=True)
    o = (o - mean) * jax.lax.rsqrt(var + eps)
    return (o * ln_scale + ln_bias).astype(dt)
