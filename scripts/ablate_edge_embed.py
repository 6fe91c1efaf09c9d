#!/usr/bin/env python
"""Ablation probe for the fused edge-embedder kernel.

The corrected component map (BASELINE.md, round 4) has the embedder at
0.878 ms per call at B=8 L=256 vs a ~0.33 ms byte floor — the gap is
VPU-side pairwise feature building. Attribution variants isolate the
relative-position trig build, the distogram one-hot, and the MLP; the
`trig_pcat` variant rebuilds the trig stage with PRE-CONCATENATED node
tables so the pairwise products run 3 passes at 32/128 lane utilization
instead of ~7 passes at 16/128:

    rel = [sin_rel | cos_rel] = P*Q + R*S
    P = [sq|cq], Q = [ck|ck], R = [cq|sq], S = [-sk|sk]   (node-sized)

Measurement tool, not part of the build.
"""
from __future__ import annotations

import argparse
import functools
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from str2str_tpu.utils.jax_setup import setup as _jax_setup
_jax_setup()

import jax
import jax.numpy as jnp
import math
from jax.experimental import pallas as pl

from str2str_tpu.ops import edge_embed as EE


def slope_time(fn, z, rest, n_short=20, n_long=80):
    """ndim-agnostic version of ablate_edge_mlp.slope_time (one-element
    in-place carry behind an optimization_barrier; see that docstring)."""
    nd = z.ndim

    def total_ms(iters):
        @jax.jit
        def chained(z0, *r):
            def step(zc, _):
                outs = fn(zc, *r)
                if not isinstance(outs, tuple):
                    outs = (outs,)
                outs = jax.lax.optimization_barrier(outs)
                bump = (outs[0].reshape(-1)[0] * 1e-12).astype(zc.dtype)
                zc = jax.lax.dynamic_update_slice(
                    zc, zc[(slice(0, 1),) * nd] + bump, (0,) * nd)
                return zc, ()
            zf, _ = jax.lax.scan(step, z0, None, length=iters)
            return jnp.sum(zf.astype(jnp.float32))

        chained(z * 0.999, *rest).block_until_ready()  # compile+warm
        t0 = time.perf_counter()
        float(chained(z, *rest))
        return (time.perf_counter() - t0) * 1e3

    return (total_ms(n_long) - total_ms(n_short)) / (n_long - n_short)


def _variant_kernel(rowp_ref, colp_ref, sq_ref, cq_ref, sk_ref, ck_ref,
                    scq_ref, sck_ref,
                    krel_ref, kd_ref, k1_ref, k2_ref,
                    b0_ref, b1_ref, b2_ref, ln_s_ref, ln_b_ref,
                    lo2_ref, hi2_ref,
                    out_ref, *, eps: float, mode: str):
    Qb = rowp_ref.shape[1]
    L = colp_ref.shape[1]
    D = rowp_ref.shape[2]
    dt = out_ref.dtype

    if mode == "copy":
        # I/O probe: one write of the out tile from a node-sized broadcast.
        out_ref[0] = (rowp_ref[0][:, None, :]
                      + colp_ref[0][None, :, :]).astype(dt)
        return

    x = jnp.zeros((Qb * L, D), jnp.float32)

    if mode not in ("no_trig", "dots_only"):
        if mode in ("trig_pcat", "pcat_full"):
            # sq_ref/cq_ref arrive pre-concatenated as P=[sq|cq], R=[cq|sq]
            # (Qb, PE); sk_ref/ck_ref as Q=[ck|ck], S=[-sk|sk] (L, PE).
            P = sq_ref[0][:, None, :]
            R = cq_ref[0][:, None, :]
            Q = ck_ref[0][None, :, :]
            S = sk_ref[0][None, :, :]
            rel_embed = (P * Q + R * S).astype(dt)     # (Qb, L, PE)
            PE = rel_embed.shape[-1]
        else:
            sq = sq_ref[0][:, None, :]
            cq = cq_ref[0][:, None, :]
            sk = sk_ref[0][None, :, :]
            ck = ck_ref[0][None, :, :]
            sin_rel = (sq * ck - cq * sk).astype(dt)
            cos_rel = (cq * ck + sq * sk).astype(dt)
            rel_embed = jnp.concatenate([sin_rel, cos_rel], axis=-1)
            PE = rel_embed.shape[-1]
        x = x + jnp.dot(rel_embed.reshape(Qb * L, PE), krel_ref[:],
                        preferred_element_type=jnp.float32)

    if mode not in ("no_dist", "dots_only"):
        cross = jax.lax.dot_general(
            scq_ref[0], sck_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        qq = jnp.sum(scq_ref[0] * scq_ref[0], axis=-1)
        kk = jnp.sum(sck_ref[0] * sck_ref[0], axis=-1)
        d2 = qq[:, None] + kk[None, :] - 2.0 * cross
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


def edge_embed_variant(row_part, col_part, residue_idx, sc_ca,
                       krel, kd, k1, k2, b0, b1, b2, ln_scale, ln_bias,
                       *, min_bin, max_bin, num_bins, init_embed_size,
                       max_len=2056, eps=1e-6, query_block=16,
                       mode="stock", vmem_mb=32, interpret=False):
    B, Lr, D = row_part.shape
    Lc = col_part.shape[1]
    dt = row_part.dtype
    qb = min(query_block, Lr)

    half = init_embed_size // 2
    freq = math.pi / max_len ** (2 * jnp.arange(half, dtype=jnp.float32)
                                 / init_embed_size)
    lower = jnp.linspace(min_bin, max_bin, num_bins)
    upper = jnp.concatenate([lower[1:], jnp.asarray([1e8])])
    lo2 = (lower ** 2).reshape(1, -1)
    hi2 = (upper ** 2).reshape(1, -1)

    phase = residue_idx.astype(jnp.float32)[..., None] * freq
    sin_t, cos_t = jnp.sin(phase), jnp.cos(phase)
    if mode in ("trig_pcat", "pcat_full"):
        # Pre-concatenated node tables (see module docstring).
        a1 = jnp.concatenate([sin_t, cos_t], axis=-1)    # P = [sq|cq]
        a2 = jnp.concatenate([cos_t, sin_t], axis=-1)    # R = [cq|sq]
        a3 = jnp.concatenate([cos_t, cos_t], axis=-1)    # Q = [ck|ck]
        a4 = jnp.concatenate([-sin_t, sin_t], axis=-1)   # S = [-sk|sk]
        sinq, cosq, sink, cosk = a1, a2, a4, a3
        hw = 2 * half
    else:
        sinq, cosq, sink, cosk = sin_t, cos_t, sin_t, cos_t
        hw = half
    scq = sc_ca.astype(jnp.float32)

    PE, NB = krel.shape[0], kd.shape[0]
    vecs = [v.reshape(1, -1).astype(jnp.float32)
            for v in (b0, b1, b2, ln_scale, ln_bias)]
    in_specs = [
        pl.BlockSpec((1, qb, D), lambda b, i: (b, i, 0)),
        pl.BlockSpec((1, Lc, D), lambda b, i: (b, 0, 0)),
        pl.BlockSpec((1, qb, hw), lambda b, i: (b, i, 0)),
        pl.BlockSpec((1, qb, hw), lambda b, i: (b, i, 0)),
        pl.BlockSpec((1, Lc, hw), lambda b, i: (b, 0, 0)),
        pl.BlockSpec((1, Lc, hw), lambda b, i: (b, 0, 0)),
        pl.BlockSpec((1, qb, 3), lambda b, i: (b, i, 0)),
        pl.BlockSpec((1, Lc, 3), lambda b, i: (b, 0, 0)),
        pl.BlockSpec((PE, D), lambda b, i: (0, 0)),
        pl.BlockSpec((NB, D), lambda b, i: (0, 0)),
        pl.BlockSpec((D, D), lambda b, i: (0, 0)),
        pl.BlockSpec((D, D), lambda b, i: (0, 0)),
        *[pl.BlockSpec((1, D), lambda b, i: (0, 0)) for _ in range(5)],
        pl.BlockSpec((1, NB), lambda b, i: (0, 0)),
        pl.BlockSpec((1, NB), lambda b, i: (0, 0)),
    ]
    args = [row_part, col_part, sinq, cosq, sink, cosk, scq, scq,
            krel.astype(dt), kd.astype(dt), k1.astype(dt), k2.astype(dt),
            *vecs, lo2, hi2]
    from jax.experimental.pallas import tpu as pltpu
    cp = pltpu.CompilerParams(vmem_limit_bytes=vmem_mb * 1024 * 1024)
    return pl.pallas_call(
        functools.partial(_variant_kernel, eps=eps, mode=mode),
        interpret=interpret,
        compiler_params=None if interpret else cp,
        grid=(B, Lr // qb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, qb, Lc, D), lambda b, i: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, Lr, Lc, D), dt),
    )(*args)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=8)
    ap.add_argument("--L", type=int, default=256)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--modes",
                    default="copy,dots_only,no_trig,no_dist,stock,trig_pcat")
    ap.add_argument("--qbs", default="16,32,64")
    ap.add_argument("--vmem-mb", type=int, default=100)
    ap.add_argument("--interpret", action="store_true")
    ns = ap.parse_args()
    B, L = ns.B, ns.L
    dt = jnp.dtype(ns.dtype)
    D = 128
    hp = dict(min_bin=1e-5, max_bin=20.0, num_bins=22,
              init_embed_size=32, max_len=2056)
    print(f"device: {jax.devices()[0].platform}, B={B} L={L} {dt.name}")

    key = jax.random.PRNGKey(0)
    ks = iter(jax.random.split(key, 32))
    rnd = lambda *s, d=dt: (jax.random.normal(next(ks), s, jnp.float32) * 0.1).astype(d)
    rowp, colp = rnd(B, L, D), rnd(B, L, D)
    ridx = jnp.tile(jnp.arange(L, dtype=jnp.int32), (B, 1))
    sc_ca = rnd(B, L, 3, d=jnp.float32) * 50.0
    PE, NB = hp["init_embed_size"], hp["num_bins"]
    w = dict(krel=rnd(PE, D), kd=rnd(NB, D), k1=rnd(D, D), k2=rnd(D, D),
             b0=rnd(D), b1=rnd(D), b2=rnd(D),
             ln_scale=rnd(D) + 1.0, ln_bias=rnd(D))

    ref = EE.edge_embed_reference(
        rowp, colp, ridx, sc_ca, **w, **hp, self_conditioning=True)

    rest = (colp, ridx, sc_ca)
    for mode in ns.modes.split(","):
        for qb in [int(x) for x in ns.qbs.split(",")]:
            if L % qb:
                continue
            fn = lambda rp, cp_, ri, sc: edge_embed_variant(
                rp, cp_, ri, sc, **w, **hp, mode=mode, query_block=qb,
                vmem_mb=ns.vmem_mb, interpret=ns.interpret)
            try:
                t = slope_time(lambda zc, *r: fn(zc, *r), rowp, rest)
            except Exception as e:  # noqa: BLE001
                print(f"  {mode:10s} qb={qb:3d}   FAILED: {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:110]}")
                continue
            err = float("nan")
            if mode in ("stock", "trig_pcat"):
                err = float(jnp.max(jnp.abs(
                    fn(rowp, *rest).astype(jnp.float32)
                    - ref.astype(jnp.float32))))
            extra = f"max|err| {err:.2e}"
            if mode == "copy":
                nbytes = ref.size * ref.dtype.itemsize
                extra = f"{nbytes / (t * 1e-3) / 1e9:6.0f} GB/s (write)"
            print(f"  {mode:10s} qb={qb:3d}   {t:7.3f} ms   {extra}")


if __name__ == "__main__":
    main()
