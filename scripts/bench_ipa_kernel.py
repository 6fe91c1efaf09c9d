#!/usr/bin/env python
"""Microbenchmark: fused Pallas IPA attention vs the XLA path.

Timing methodology (both pitfalls below produced plausible-looking garbage
in earlier rounds):

  * SLOPE timing: each measurement chains iterations through a data
    dependency inside one jitted `lax.scan` and runs TWO scan lengths; the
    reported time is (t_long - t_short)/(n_long - n_short). The per-call
    fixed overhead through the execution tunnel is ~28 ms — at 20
    iterations that is 1.4 ms/iter of fake time, enough to make every
    sub-ms kernel "measure" identical.
  * z must be CARRY-DEPENDENT: with z loop-invariant, XLA hoists the z
    projections (pair bias / down_z — the dominant HBM traffic) out of the
    scan and the XLA path measures faster than its own z-read floor. In
    production z changes every block. The carry update itself charges one
    z read+write per iteration to BOTH paths symmetrically (production
    pays the z' write in EdgeTransition).

Rows reported per dtype:
  xla    — reference path: z projections + [B,H,L,L] logits in XLA.
  pallas — full fused path incl. `make_proj` (one z read + proj write per
           call). This OVERCHARGES production, where the previous block's
           EdgeTransition kernel emits proj from VMEM and z is never read
           (mega-fusion); it is the standalone-op cost.
  pallas+mega — `ipa_attention_with_proj` with proj carried instead of z:
           the production mega-fusion configuration (z untouched; carry
           charges proj read+write instead).

Headline shape: B=8, L=256, H=8, C=256, Pq=8, Pv=12, Cz=128.
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


def timeit(fn, q, big, rest, n_short=20, n_long=80):
    """Slope-time fn(q, big, *rest) with BOTH q and `big` (z or proj)
    carried through the scan so nothing operand-sized is hoisted."""
    def fold(carry, bump):
        # One-element in-place carry perturbation (~zero harness bytes; the
        # old full-tensor `carry + sum(out)*1e-12` added ~0.1-0.6 ms/iter
        # of harness HBM traffic — see BASELINE.md round-3 correction).
        flat = carry.reshape(-1)
        flat = jax.lax.dynamic_update_slice(
            flat, flat[:1] + bump.astype(carry.dtype), (0,))
        return flat.reshape(carry.shape)

    def total_ms(iters):
        @jax.jit
        def chained(q0, big0, *r):
            def step(carry, _):
                qc, bc = carry
                outs = jax.lax.optimization_barrier(fn(qc, bc, *r))
                s = sum(o.reshape(-1)[0].astype(jnp.float32)
                        for o in outs) * 1e-12
                return (fold(qc, s), fold(bc, s)), ()
            (qf, bf), _ = jax.lax.scan(step, (q0, big0), None, length=iters)
            return (jnp.sum(qf.astype(jnp.float32))
                    + jnp.sum(bf.astype(jnp.float32)))

        # The execution service memoizes identical (program, input) pairs:
        # warm up and time on DIFFERENT inputs; float() forces to host
        # (block_until_ready does not reliably block through the tunnel).
        float(chained(q + jnp.asarray(1.0, q.dtype), big, *rest))
        t0 = time.perf_counter()
        float(chained(q, big, *rest))
        return (time.perf_counter() - t0) * 1e3

    return (total_ms(n_long) - total_ms(n_short)) / (n_long - n_short)


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=8)
    ap.add_argument("--L", type=int, default=256)
    ns = ap.parse_args()
    B, L, H, C, Pq, Pv, Cz = ns.B, ns.L, 8, 256, 8, 12, 128
    print(f"device: {jax.devices()[0].platform}, shape B={B} L={L}")
    for dtype in (jnp.bfloat16, jnp.float32):
        args = make_args(B, L, H, C, Pq, Pv, Cz, dtype)
        (q, k, v, qp, kp, vp, z, kb, bb, kdz, bdz, hw, mask) = args
        rest = (k, v, qp, kp, vp, kb, bb, kdz, bdz, hw, mask)

        def xla_fn(qc, zc, k, v, qp, kp, vp, kb, bb, kdz, bdz, hw, mask):
            return IA.ipa_attention_reference(qc, k, v, qp, kp, vp, zc,
                                              kb, bb, kdz, bdz, hw, mask)

        def pal_fn(qc, zc, k, v, qp, kp, vp, kb, bb, kdz, bdz, hw, mask):
            return IA.ipa_attention_pallas(qc, k, v, qp, kp, vp, zc,
                                           kb, bb, kdz, bdz, hw, mask)

        def mega_fn(qc, projc, k, v, qp, kp, vp, kb, bb, kdz, bdz, hw, mask):
            return IA.ipa_attention_with_proj(qc, k, v, qp, kp, vp, projc,
                                              hw, mask)

        proj = IA.make_proj(z, kb, bb, kdz, bdz, dtype)
        xla = timeit(xla_fn, q, z, rest)
        pal = timeit(pal_fn, q, z, rest)
        mega = timeit(mega_fn, q, proj, rest)

        # correctness spot check on device
        ref = IA.ipa_attention_reference(*args)
        out = IA.ipa_attention_pallas(*args)
        m = np.asarray(mask)[..., None]
        errs = [float(np.max(np.abs((np.asarray(a, np.float32)
                                     - np.asarray(b, np.float32)) * m)))
                for a, b in zip(ref, out)]
        print(f"{np.dtype(dtype).name:9s}  xla {xla:7.3f} ms   "
              f"pallas {pal:7.3f} ms ({xla / pal:4.2f}x)   "
              f"pallas+mega {mega:7.3f} ms ({xla / mega:4.2f}x)   "
              f"max|err| {max(errs):.3e}")


if __name__ == "__main__":
    main()
