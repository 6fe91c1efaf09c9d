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
    """Marginal per-iteration cost of fn via two chained scan lengths.

    The carry dependency is a ONE-ELEMENT in-place perturbation of z from a
    one-element slice of the output: enough to defeat loop hoisting and
    service memoization, while adding ~zero HBM traffic. (The earlier
    full-tensor `z + sum(out)*1e-12` carry added ~400 MB/iter of harness
    traffic — a ~0.6 ms/iter constant that made every sub-ms kernel look
    bandwidth-starved.)"""
    def total_ms(iters):
        @jax.jit
        def chained(z0, *r):
            def step(zc, _):
                outs = fn(zc, *r)
                if not isinstance(outs, tuple):
                    outs = (outs,)
                # Barrier: the output must be fully materialized even though
                # the carry only reads one element (else XLA would DCE an
                # elementwise `fn` down to a single element).
                outs = jax.lax.optimization_barrier(outs)
                bump = (outs[0].reshape(-1)[0] * 1e-12).astype(zc.dtype)
                zc = jax.lax.dynamic_update_slice(
                    zc, (zc[:1, :1, :1, :1] + bump), (0, 0, 0, 0))
                return zc, ()
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

    if mode == "copy":
        # pure I/O probe: stream z in, write a Cout-wide slice back out.
        # Time ≈ max(HBM stream, per-grid-cell fixed overhead).
        out_ref[0] = z[..., :out_ref.shape[-1]]
        return
    if mode == "raw_dot":
        # a single isolated matmul (R*L, Cz) @ (Cz, H): pure MXU probe
        o = jnp.dot(z2, k1z_ref[:], preferred_element_type=jnp.float32)
        out_ref[0] = o[:, :out_ref.shape[-1]].reshape(R, L, -1).astype(dt)
        return
    if mode == "one_dot":
        # isolate the big (R*L, 384) @ (384, 384) matmul: feed a bf16 input
        # of the hidden width built from z via a cheap slice-free pad
        h = jnp.concatenate([z2, z2, z2], axis=-1)       # (R*L, 384) dt
        o = jnp.dot(h, k2_ref[:], preferred_element_type=jnp.float32)
        out_ref[0] = o[:, :out_ref.shape[-1]].reshape(R, L, -1).astype(dt)
        return

    if mode == "int8_raw":
        # one int8 MXU dot at the k2 shape: quantize a (R*L, H)-shaped
        # bf16 input per row, dot against a pre-shaped int8 weight, dequant.
        # Probes whether Mosaic lowers int8 x int8 -> int32 onto the MXU at
        # 2x the bf16 rate.
        h = jnp.concatenate([z2, z2, z2], axis=-1).astype(jnp.float32)
        sx = jnp.max(jnp.abs(h), axis=-1, keepdims=True) / 127.0 + 1e-8
        hq = jnp.clip(jnp.round(h / sx), -127, 127).astype(jnp.int8)
        wq = jnp.clip(jnp.round(k2_ref[:].astype(jnp.float32) / 0.01),
                      -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(hq, wq, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        o = acc.astype(jnp.float32) * (sx * 0.01)
        out_ref[0] = o[:, :out_ref.shape[-1]].reshape(R, L, -1).astype(dt)
        return
    if mode == "int8_dots":
        # full int8 MLP chain (per-row dynamic activation scales, scalar
        # weight scale for the probe), node adds + relu in f32 between.
        def q(x):
            s = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0 + 1e-8
            return jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8), s
        def qw(w):
            s = jnp.max(jnp.abs(w.astype(jnp.float32))) / 127.0 + 1e-8
            return (jnp.clip(jnp.round(w.astype(jnp.float32) / s), -127, 127)
                    .astype(jnp.int8), s)
        k1q, s1 = qw(k1z_ref[:])
        k2q, s2 = qw(k2_ref[:])
        kfhq, sfh = qw(kfh_ref[:])
        kfzq, sfz = qw(kfz_ref[:])
        zq, sz = q(z2.astype(jnp.float32))
        h = jax.lax.dot_general(zq, k1q, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        h = h.astype(jnp.float32) * (sz * s1)
        ni1b = ni1_ref[0] + b1_ref[0]
        h = h.reshape(R, L, -1) + ni1b[:, None, :] + nj1_ref[0][None, :, :]
        h = jnp.maximum(h, 0.0)
        H = h.shape[-1]
        hq, sh = q(h.reshape(R * L, H))
        h2 = jax.lax.dot_general(hq, k2q, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
        h2 = jnp.maximum(h2.astype(jnp.float32) * (sh * s2) + b2_ref[0], 0.0)
        h2q, sh2 = q(h2)
        o = (jax.lax.dot_general(h2q, kfhq, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
             .astype(jnp.float32) * (sh2 * sfh))
        o = o + (jax.lax.dot_general(zq, kfzq, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.int32)
                 .astype(jnp.float32) * (sz * sfz))
        Cout = o.shape[-1]
        nfib = nfi_ref[0] + bf_ref[0]
        o = o.reshape(R, L, Cout) + nfib[:, None, :] + nfj_ref[0][None, :, :]
        mean = jnp.mean(o, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(o - mean), axis=-1, keepdims=True)
        o = (o - mean) * jax.lax.rsqrt(var + eps)
        out_ref[0] = (o * ln_scale_ref[0] + ln_bias_ref[0]).astype(dt)
        return

    if mode.startswith("chunk"):
        # Split the row block into sub-chunks processed back-to-back in one
        # body: chunks are data-independent, so the Mosaic scheduler can
        # overlap chunk i's VPU epilogue (relu/astype/LN) with chunk i+1's
        # MXU dots. Probes whether dot->relu->dot serialization is the gap.
        n_chunks = int(mode[5:] or 2)
        outs = []
        step = (R * L) // n_chunks
        for ci in range(n_chunks):
            zc = z2[ci * step:(ci + 1) * step]
            h = jnp.dot(zc, k1z_ref[:], preferred_element_type=jnp.float32)
            h = jnp.maximum(h, 0.0).astype(dt)
            h = jnp.dot(h, k2_ref[:], preferred_element_type=jnp.float32)
            h = jnp.maximum(h, 0.0).astype(dt)
            o = jnp.dot(h, kfh_ref[:], preferred_element_type=jnp.float32)
            o = o + jnp.dot(zc, kfz_ref[:], preferred_element_type=jnp.float32)
            outs.append(o)
        o = jnp.concatenate(outs, axis=0)
        out_ref[0] = o.reshape(R, L, -1).astype(dt)
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
    if mode == "ln_lite":
        # stock math, but the LN epilogue collapsed to minimal VPU passes:
        # stats via sum/sumsq in two reduces, then ONE affine pass
        # out = o * (rstd*scale) + (bias - mean*rstd*scale).
        h = (h.reshape(R, L, -1)
             + (ni1_ref[0] + b1_ref[0])[:, None, :] + nj1_ref[0][None, :, :])
        h = jnp.maximum(h, 0.0).astype(dt)
        H = h.shape[-1]
        h = jnp.dot(h.reshape(R * L, H), k2_ref[:],
                    preferred_element_type=jnp.float32)
        h = jnp.maximum(h + b2_ref[0], 0.0).astype(dt)
        o = jnp.dot(h, kfh_ref[:], preferred_element_type=jnp.float32)
        o = o + jnp.dot(z2, kfz_ref[:], preferred_element_type=jnp.float32)
        Cout = o.shape[-1]
        o = (o.reshape(R, L, Cout)
             + (nfi_ref[0] + bf_ref[0])[:, None, :] + nfj_ref[0][None, :, :])
        mean = jnp.mean(o, axis=-1, keepdims=True)
        meansq = jnp.mean(o * o, axis=-1, keepdims=True)
        rstd = jax.lax.rsqrt(meansq - mean * mean + eps)
        a = rstd * ln_scale_ref[0]
        b = ln_bias_ref[0] - mean * a
        out_ref[0] = (o * a + b).astype(dt)
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
                     mode="stock", row_block=16, eps=1e-6,
                     vmem_mb=32, semantics=None, interpret=False):
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
    from jax.experimental.pallas import tpu as pltpu
    cp = pltpu.CompilerParams(vmem_limit_bytes=vmem_mb * 1024 * 1024,
                              dimension_semantics=semantics)
    return pl.pallas_call(
        functools.partial(_variant_body, eps=eps, mode=mode),
        interpret=interpret,
        compiler_params=None if interpret else cp,
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
    ap.add_argument("--modes", default="copy,raw_dot,one_dot,dots_only,stock")
    ap.add_argument("--rbs", default="16,32")
    ap.add_argument("--vmem-mb", type=int, default=100)
    ap.add_argument("--semantics", action="store_true")
    ap.add_argument("--interpret", action="store_true")
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

    # reference output for correctness checks (XLA oracle: runs anywhere)
    ref_out, ref_proj = EM.edge_mlp_proj_reference(
        z, *rest, *(w[n] for n in ("k1z", "k2", "kfh", "kfz", "b1", "b2",
                                   "bf", "ln_scale", "ln_bias")),
        wcatT, bcat)

    def check(fn):
        out = fn(z, *rest)
        if not isinstance(out, tuple):
            out = (out,)
        errs = [float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                      - b.astype(jnp.float32))))
                for a, b in zip(out, (ref_out, ref_proj))]
        return max(errs)

    ap2 = dict(modes=ns.modes.split(","), rbs=[int(x) for x in ns.rbs.split(",")])
    for mode in ap2["modes"]:
        if mode == "xla_copy":
            # XLA's own stream rate on the same tensor (read+write 2x z bytes)
            fn = lambda zc, *r: zc * jnp.asarray(1.0001, zc.dtype)
            t = slope_time(fn, z, rest)
            gbs = 2 * z.size * z.dtype.itemsize / (t * 1e-3) / 1e9
            print(f"  {mode:14s} rb=  -    {t:7.3f} ms   {gbs:6.0f} GB/s")
            continue
        for rb in ap2["rbs"]:
            if L % rb:
                continue
            sem = None
            if ns.semantics:
                sem = ("parallel", "arbitrary")
            fn = lambda zc, *r: edge_mlp_variant(zc, *r, **w, mode=mode,
                                                 row_block=rb,
                                                 vmem_mb=ns.vmem_mb,
                                                 semantics=sem,
                                                 interpret=ns.interpret)
            try:
                t = slope_time(fn, z, rest)
            except Exception as e:  # noqa: BLE001 — report and move on
                print(f"  {mode:14s} rb={rb:3d}    FAILED: {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:120]}")
                continue
            err = (check(fn) if mode in ("stock", "bf16_epilogue", "ln_lite",
                                         "int8_dots") else float("nan"))
            extra = f"max|err| {err:.2e}"
            if mode == "copy":
                gbs = 2 * z.size * z.dtype.itemsize / (t * 1e-3) / 1e9
                extra = f"{gbs:6.0f} GB/s"
            print(f"  {mode:14s} rb={rb:3d}    {t:7.3f} ms   {extra}")


if __name__ == "__main__":
    main()
