#!/usr/bin/env python
"""Does the v5e MXU int8 path actually pay at the EdgeTransition shapes?

The int8-dots variant of the fused edge MLP measured SLOWER end-to-end
than bf16 (936 vs 1124 NFE/s at B=8/L=256) despite the 394 TOPS vs
197 TFLOP/s peak ratio. Two candidate explanations:
  (a) Mosaic does not reach the int8 rate for these contraction shapes
      (K=128/384 with int32 accumulation), so there is no MXU win to buy;
  (b) the win exists but the per-row quantize/dequant VPU passes cost more
      than it buys.
This probe separates them: single Pallas dots with PRE-quantized operands
(no quant overhead at all) in bf16 vs int8, slope-timed with the
one-element carry. Measurement tool, not part of the build.
"""
from __future__ import annotations

import argparse
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from str2str_tpu.utils.jax_setup import setup as _jax_setup
_jax_setup()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def slope_time(fn, x, rest, n_short=50, n_long=250):
    nd = x.ndim

    def total_ms(iters):
        @jax.jit
        def chained(x0, *r):
            def step(xc, _):
                out = jax.lax.optimization_barrier(fn(xc, *r))
                bump = (out.reshape(-1)[0].astype(jnp.float32) * 1e-12)
                xc = jax.lax.dynamic_update_slice(
                    xc, (xc[(slice(0, 1),) * nd].astype(jnp.float32)
                         + bump).astype(xc.dtype), (0,) * nd)
                return xc, ()
            xf, _ = jax.lax.scan(step, x0, None, length=iters)
            return jnp.sum(xf.astype(jnp.float32))

        chained(x, *rest).block_until_ready()
        t0 = time.perf_counter()
        float(chained(x, *rest))
        return (time.perf_counter() - t0) * 1e3

    return (total_ms(n_long) - total_ms(n_short)) / (n_long - n_short)


def dot_kernel(a_ref, b_ref, o_ref, *, acc):
    o_ref[...] = jax.lax.dot_general(
        a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=acc).astype(o_ref.dtype)


def timed_dot(M, K, N, in_dtype, acc, out_dtype, grid_m=64):
    """One Pallas dot (M,K)x(K,N), gridded over M like the edge kernel."""
    key = jax.random.PRNGKey(0)
    if in_dtype == jnp.int8:
        a = jax.random.randint(key, (M, K), -127, 127, jnp.int32).astype(jnp.int8)
        b = jax.random.randint(key, (K, N), -127, 127, jnp.int32).astype(jnp.int8)
    else:
        a = (jax.random.normal(key, (M, K), jnp.float32) * 0.1).astype(in_dtype)
        b = (jax.random.normal(key, (K, N), jnp.float32) * 0.1).astype(in_dtype)
    mb = M // grid_m

    f = pl.pallas_call(
        functools.partial(dot_kernel, acc=acc),
        grid=(grid_m,),
        in_specs=[pl.BlockSpec((mb, K), lambda i: (i, 0)),
                  pl.BlockSpec((K, N), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((mb, N), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
    )
    ms = slope_time(lambda ac: f(ac, b), a, ())
    gflop = 2 * M * K * N / 1e9
    return ms, gflop / ms  # ms, TFLOP(or TOP)/s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--M", type=int, default=131072)
    args = ap.parse_args()
    M = args.M
    print(f"device: {jax.devices()[0]}; M={M} (rows per call, grid 64)")
    shapes = [(128, 384), (384, 384), (384, 128), (128, 128)]
    print(f"{'KxN':>10} | {'bf16 ms':>8} {'TF/s':>6} | {'int8 ms':>8} {'TOP/s':>6} | ratio")
    for K, N in shapes:
        ms_b, tf_b = timed_dot(M, K, N, jnp.bfloat16, jnp.float32, jnp.bfloat16)
        ms_i, tf_i = timed_dot(M, K, N, jnp.int8, jnp.int32, jnp.int32)
        print(f"{K:>4}x{N:<5} | {ms_b:8.3f} {tf_b:6.0f} | {ms_i:8.3f} {tf_i:6.0f} "
              f"| {ms_b / ms_i:4.2f}x")


if __name__ == "__main__":
    main()
