#!/usr/bin/env python
"""Ablation probe for the fused EdgeTransition kernel (the forward's
dominant cost: 2.08 ms of a ~7.5 ms forward at B=8 L=256, vs a
~0.75 ms MXU / ~0.5 ms HBM floor).

Variants: row_block sweep, proj emission on/off, batched proj dot
(one MXU call with a broadcast wT instead of R per-row dots).
Slope timing with z carried. Measurement tool, not part of the build.
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
from jax.experimental import pallas as pl

from str2str_tpu.ops import edge_mlp as EM


def slope_time(fn, z, rest, n_short=20, n_long=80):
    def total_ms(iters):
        @jax.jit
        def chained(z0, *r):
            def step(zc, _):
                outs = fn(zc, *r)
                if not isinstance(outs, tuple):
                    outs = (outs,)
                s = sum(jnp.sum(o.astype(jnp.float32)) for o in outs)
                return zc + (s * 1e-12).astype(zc.dtype), ()
            zf, _ = jax.lax.scan(step, z0, None, length=iters)
            return jnp.sum(zf.astype(jnp.float32))

        float(chained(z + jnp.asarray(1.0, z.dtype), *rest))
        t0 = time.perf_counter()
        float(chained(z, *rest))
        return (time.perf_counter() - t0) * 1e3

    return (total_ms(n_long) - total_ms(n_short)) / (n_long - n_short)


# --- body-variant kernels: attribute the ~2.1 ms inside _forward_body -------
# (the broadcast-wT batched proj dot was tried and hits a Mosaic
# vector_extract_slice crash — per-row dots stay.)

def _variant_body(z_ref, ni1_ref, nj1_ref, nfi_ref, nfj_ref,
                  k1z_ref, k2_ref, kfh_ref, kfz_ref,
                  b1_ref, b2_ref, bf_ref, ln_scale_ref, ln_bias_ref,
                  out_ref, *, eps: float, mode: str):
    z = z_ref[0]
    R, L, Cz = z.shape
    dt = z.dtype
    z2 = z.reshape(R * L, Cz)

    if mode == "one_dot":
        # isolate the big (R*L, 384) @ (384, 384) matmul: feed a bf16 input
        # of the hidden width built from z via a cheap slice-free pad
        h = jnp.concatenate([z2, z2, z2], axis=-1)       # (R*L, 384) dt
        o = jnp.dot(h, k2_ref[:], preferred_element_type=jnp.float32)
        out_ref[0] = o[:, :out_ref.shape[-1]].reshape(R, L, -1).astype(dt)
        return
    if mode == "bf16_out":
        # no f32 anywhere in the MLP chain: MXU emits bf16, relu in bf16
        h = jnp.dot(z2, k1z_ref[:])                      # dt out
        h = (h.reshape(R, L, -1) + ni1_ref[0][:, None, :].astype(dt)
             + nj1_ref[0][None, :, :].astype(dt))
        h = jnp.maximum(h + b1_ref[0].astype(dt), 0)
        H = h.shape[-1]
        h = jnp.dot(h.reshape(R * L, H), k2_ref[:])
        h = jnp.maximum(h + b2_ref[0].astype(dt), 0)
        o = jnp.dot(h, kfh_ref[:], preferred_element_type=jnp.float32)
        o = o + jnp.dot(z2, kfz_ref[:], preferred_element_type=jnp.float32)
        Cout = o.shape[-1]
        o = (o.reshape(R, L, Cout) + nfi_ref[0][:, None, :]
             + nfj_ref[0][None, :, :] + bf_ref[0])
        mean = jnp.mean(o, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(o - mean), axis=-1, keepdims=True)
        o = (o - mean) * jax.lax.rsqrt(var + eps)
        out_ref[0] = (o * ln_scale_ref[0] + ln_bias_ref[0]).astype(dt)
        return

    h = jnp.dot(z2, k1z_ref[:], preferred_element_type=jnp.float32)
    if mode == "dots_only":
        h = jnp.maximum(h, 0.0).astype(dt)
        h = jnp.dot(h, k2_ref[:], preferred_element_type=jnp.float32)
        h = jnp.maximum(h, 0.0).astype(dt)
        o = jnp.dot(h, kfh_ref[:], preferred_element_type=jnp.float32)
        o = o + jnp.dot(z2, kfz_ref[:], preferred_element_type=jnp.float32)
        out_ref[0] = o.reshape(R, L, -1).astype(dt)
        return
    if mode == "bf16_epilogue":
        h = (h.astype(dt).reshape(R, L, -1)
             + ni1_ref[0][:, None, :].astype(dt)
             + nj1_ref[0][None, :, :].astype(dt))
        h = jnp.maximum(h + b1_ref[0].astype(dt), 0)
        H = h.shape[-1]
        h = jnp.dot(h.reshape(R * L, H), k2_ref[:],
                    preferred_element_type=jnp.float32)
        h = jnp.maximum(h.astype(dt) + b2_ref[0].astype(dt), 0)
        o = jnp.dot(h, kfh_ref[:], preferred_element_type=jnp.float32)
        o = o + jnp.dot(z2, kfz_ref[:], preferred_element_type=jnp.float32)
        Cout = o.shape[-1]
        o = (o.reshape(R, L, Cout) + nfi_ref[0][:, None, :]
             + nfj_ref[0][None, :, :] + bf_ref[0])
        mean = jnp.mean(o, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(o - mean), axis=-1, keepdims=True)
        o = (o - mean) * jax.lax.rsqrt(var + eps)
        out_ref[0] = (o * ln_scale_ref[0] + ln_bias_ref[0]).astype(dt)
        return
    # no_ln / no_node variants reuse the stock body shape
    h = h.reshape(R, L, -1)
    if mode != "no_node":
        h = h + ni1_ref[0][:, None, :] + nj1_ref[0][None, :, :]
    h = jnp.maximum(h + b1_ref[0], 0.0).astype(dt)
    H = h.shape[-1]
    h = jnp.dot(h.reshape(R * L, H), k2_ref[:],
                preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b2_ref[0], 0.0).astype(dt)
    o = jnp.dot(h, kfh_ref[:], preferred_element_type=jnp.float32)
    o = o + jnp.dot(z2, kfz_ref[:], preferred_element_type=jnp.float32)
    Cout = o.shape[-1]
    o = o.reshape(R, L, Cout)
    if mode != "no_node":
        o = o + nfi_ref[0][:, None, :] + nfj_ref[0][None, :, :]
    o = o + bf_ref[0]
    if mode != "no_ln":
        mean = jnp.mean(o, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(o - mean), axis=-1, keepdims=True)
        o = (o - mean) * jax.lax.rsqrt(var + eps)
        o = o * ln_scale_ref[0] + ln_bias_ref[0]
    out_ref[0] = o.astype(dt)


def edge_mlp_variant(z, ni1, nj1, nfi, nfj, k1z, k2, kfh, kfz,
                     b1, b2, bf, ln_scale, ln_bias,
                     mode="stock", row_block=16, eps=1e-6):
    B, L, _, Cz = z.shape
    H = k2.shape[0]
    Cout = kfh.shape[1]
    rb = min(row_block, L)
    dt = z.dtype
    ni1, nj1 = ni1.astype(jnp.float32), nj1.astype(jnp.float32)
    nfi, nfj = nfi.astype(jnp.float32), nfj.astype(jnp.float32)
    vecs = [v.reshape(1, -1).astype(jnp.float32)
            for v in (b1, b2, bf, ln_scale, ln_bias)]
    weights = [w.astype(dt) for w in (k1z, k2, kfh, kfz)]
    in_specs = [
        pl.BlockSpec((1, rb, L, Cz), lambda b, i: (b, i, 0, 0)),
        pl.BlockSpec((1, rb, H), lambda b, i: (b, i, 0)),
        pl.BlockSpec((1, L, H), lambda b, i: (b, 0, 0)),
        pl.BlockSpec((1, rb, Cout), lambda b, i: (b, i, 0)),
        pl.BlockSpec((1, L, Cout), lambda b, i: (b, 0, 0)),
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
    args = [z, ni1, nj1, nfi, nfj, *weights, *vecs]
    return pl.pallas_call(
        functools.partial(_variant_body, eps=eps, mode=mode),
        compiler_params=EM._cp(32 * 1024 * 1024),
        grid=(B, L // rb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, rb, L, Cout), lambda b, i: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, L, L, Cout), dt),
    )(*args)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=8)
    ap.add_argument("--L", type=int, default=256)
    ap.add_argument("--dtype", default="bfloat16")
    ns = ap.parse_args()
    B, L = ns.B, ns.L
    dt = jnp.dtype(ns.dtype)
    c_s, c_z = 256, 128
    hidden = c_z + c_s
    X = c_z // 4 + 8
    print(f"device: {jax.devices()[0].platform}, B={B} L={L} {dt.name}")

    key = jax.random.PRNGKey(0)
    ks = iter(jax.random.split(key, 32))
    rnd = lambda *s, d=dt: (jax.random.normal(next(ks), s, jnp.float32) * 0.1).astype(d)

    z = rnd(B, L, L, c_z)
    ni1, nj1 = rnd(B, L, hidden), rnd(B, L, hidden)
    nfi, nfj = rnd(B, L, c_z), rnd(B, L, c_z)
    w = dict(k1z=rnd(c_z, hidden), k2=rnd(hidden, hidden),
             kfh=rnd(hidden, c_z), kfz=rnd(c_z, c_z),
             b1=rnd(hidden), b2=rnd(hidden), bf=rnd(c_z),
             ln_scale=rnd(c_z) + 1.0, ln_bias=rnd(c_z))
    wcatT = rnd(X, c_z, d=jnp.float32)
    bcat = rnd(X, d=jnp.float32)
    rest = (ni1, nj1, nfi, nfj)

    # reference output for correctness checks
    ref_out, ref_proj = EM.edge_mlp_pallas(z, *rest, **w,
                                           proj_w=(wcatT, bcat))

    def check(fn):
        out = fn(z, *rest)
        if not isinstance(out, tuple):
            out = (out,)
        errs = [float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                      - b.astype(jnp.float32))))
                for a, b in zip(out, (ref_out, ref_proj))]
        return max(errs)

    for mode in ("one_dot", "bf16_out", "dots_only"):
        for rb in (16,):
            fn = lambda zc, *r: edge_mlp_variant(zc, *r, **w, mode=mode,
                                                 row_block=rb)
            t = slope_time(fn, z, rest)
            err = check(fn) if mode in ("stock", "bf16_epilogue",
                                        "bf16_out") else float("nan")
            print(f"  {mode:14s} rb={rb:3d}    {t:7.3f} ms   max|err| {err:.2e}")


if __name__ == "__main__":
    main()
