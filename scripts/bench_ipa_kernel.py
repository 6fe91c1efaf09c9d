#!/usr/bin/env python
"""Microbenchmark: fused Pallas IPA attention vs the XLA path.

Headline shape: B=8, L=256, H=8, C=256, Pq=8, Pv=12, Cz=128 (the reference
model at the benchmark length). Run on the TPU.
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from str2str_tpu.ops import ipa_attention as IA


def make_args(B, L, H, C, Pq, Pv, Cz, dtype, seed=0):
    rng = np.random.RandomState(seed)

    def r(*s, sc=0.5):
        return jnp.asarray(rng.randn(*s) * sc, dtype)

    mask = np.ones((B, L), np.float32)
    mask[:, -7:] = 0
    return (r(B, L, H * C), r(B, L, H * C), r(B, L, H * C),
            r(B, L, H * 3 * Pq), r(B, L, H * 3 * Pq), r(B, L, H * 3 * Pv),
            r(B, L, L, Cz),
            jnp.asarray(rng.randn(Cz, H) * 0.1, jnp.float32),
            jnp.asarray(rng.randn(H) * 0.1, jnp.float32),
            jnp.asarray(rng.randn(Cz, Cz // 4) * 0.1, jnp.float32),
            jnp.asarray(rng.randn(Cz // 4) * 0.1, jnp.float32),
            jnp.abs(jnp.asarray(rng.randn(H), jnp.float32)) + 0.5,
            jnp.asarray(mask))


def timeit(fn, args, iters=20):
    """Chain iterations through a data dependency inside one jit so neither
    XLA nor the execution service can cache/overlap identical calls."""
    @jax.jit
    def chained(q, *rest):
        def step(carry, _):
            o, opt, opair = fn(carry, *rest)
            # fold a piece of every output back into the query
            upd = o + (jnp.sum(opt) + jnp.sum(opair)) * jnp.asarray(0, o.dtype)
            return carry + upd * jnp.asarray(1e-2, carry.dtype), ()
        out, _ = jax.lax.scan(step, q, None, length=iters)
        return jnp.sum(out.astype(jnp.float32))  # scalar: no transfer cost

    # The remote execution service memoizes identical (program, input)
    # pairs, so warm up and time on DIFFERENT inputs, one timed execution.
    q0 = args[0]
    jax.block_until_ready(chained(q0 + jnp.asarray(1.0, q0.dtype), *args[1:]))
    t0 = time.perf_counter()
    jax.block_until_ready(chained(*args))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    B, L, H, C, Pq, Pv, Cz = 8, 256, 8, 256, 8, 12, 128
    print(f"device: {jax.devices()[0].platform}, shape B={B} L={L}")
    for dtype in (jnp.bfloat16, jnp.float32):
        args = make_args(B, L, H, C, Pq, Pv, Cz, dtype)
        xla = timeit(jax.jit(IA.ipa_attention_reference), args)
        pal = timeit(jax.jit(IA.ipa_attention_pallas), args)
        # correctness spot check on device
        ref = IA.ipa_attention_reference(*args)
        out = IA.ipa_attention_pallas(*args)
        m = np.asarray(args[-1])[..., None]
        errs = [float(np.max(np.abs((np.asarray(a, np.float32)
                                     - np.asarray(b, np.float32)) * m)))
                for a, b in zip(ref, out)]
        print(f"{np.dtype(dtype).name:9s}  xla {xla:7.3f} ms   "
              f"pallas {pal:7.3f} ms   speedup {xla / pal:5.2f}x   "
              f"max|err| {max(errs):.3e}")


if __name__ == "__main__":
    main()
