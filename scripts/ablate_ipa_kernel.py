#!/usr/bin/env python
"""Ablation probe for the fused IPA forward kernel at small-L shapes.

The B=64/L=128 bucket (all 13 in-repo targets) measures SLOWER through the
Pallas kernel than XLA (0.64x bf16). This script times kernel variants to
localize the cost: per-head loop vs batched dots, opair contraction,
multi-batch-row blocks. Not part of the build; a measurement tool.
"""
from __future__ import annotations

import argparse
import functools
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from str2str_tpu.ops import ipa_attention as IA
from str2str_tpu.ops.ipa_attention import _cp, _prep
from scripts.bench_ipa_kernel import make_args


def timeit(fn, args, iters=20):
    @jax.jit
    def chained(q, *rest):
        def step(carry, _):
            outs = fn(carry, *rest)
            # fold a scalar of every output back into the carry (qhat)
            extra = sum(jnp.sum(o.astype(jnp.float32)) for o in outs)
            return carry + (extra * 1e-12).astype(carry.dtype), ()
        out, _ = jax.lax.scan(step, q, None, length=iters)
        return jnp.sum(out.astype(jnp.float32))

    q0 = args[0]
    float(chained(q0 + jnp.asarray(1.0, q0.dtype), *args[1:]))
    t0 = time.perf_counter()
    float(chained(*args))
    return (time.perf_counter() - t0) / iters * 1e3


# --------------------------------------------------------------------------
# variant kernels operating on prepped operands
# --------------------------------------------------------------------------

def _kern_loop(qhat_ref, khat_ref, v_ref, vf_ref, proj_ref,
               o_ref, opt_ref, opair_ref, *, H, Cdz,
               with_opair=True, with_opt=True, with_bias=True):
    """Current production structure: per-head Python loop."""
    dt = v_ref.dtype
    ps = []
    for h in range(H):
        logits = jnp.dot(qhat_ref[0, h], khat_ref[0, h],
                         preferred_element_type=jnp.float32)
        if with_bias:
            logits = logits + proj_ref[0][:, Cdz + h, :].astype(jnp.float32)
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dt)
        ps.append(p)
        o_ref[0, h] = jnp.dot(p, v_ref[0, h],
                              preferred_element_type=jnp.float32).astype(dt)
        if with_opt:
            opt_ref[0, h] = jax.lax.dot_general(
                p, vf_ref[0, h], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dt)
        else:
            opt_ref[0, h] = jnp.zeros_like(opt_ref[0, h])
    if with_opair:
        p_all = jnp.stack(ps, axis=1)
        opair_ref[0] = jax.lax.dot_general(
            p_all, proj_ref[0][:, :Cdz, :], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dt)
    else:
        opair_ref[0] = jnp.zeros_like(opair_ref[0])


def _kern_batched(qhat_ref, khat_ref, v_ref, vf_ref, proj_ref,
                  o_ref, opt_ref, opair_ref, *, H, Cdz, with_bias=True):
    """Batched dot_general over the head dim (no per-head Python loop)."""
    dt = v_ref.dtype
    logits = jax.lax.dot_general(
        qhat_ref[0], khat_ref[0], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # (H, Qb, L)
    if with_bias:
        # bias lives as (Qb, H, L) inside proj -> relayout to (H, Qb, L)
        bias = proj_ref[0][:, Cdz:, :]               # (Qb, H, L)
        logits = logits + bias.transpose(1, 0, 2).astype(jnp.float32)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dt)  # (H, Qb, L)
    o_ref[0] = jax.lax.dot_general(
        p, v_ref[0], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(dt)
    opt_ref[0] = jax.lax.dot_general(
        p, vf_ref[0], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(dt)
    p_all = p.transpose(1, 0, 2)                      # (Qb, H, L)
    opair_ref[0] = jax.lax.dot_general(
        p_all, proj_ref[0][:, :Cdz, :], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(dt)


def _kern_loop_bb(qhat_ref, khat_ref, v_ref, vf_ref, proj_ref,
                  o_ref, opt_ref, opair_ref, *, H, Cdz, BB):
    """Multi-batch-row block: per (b-in-block, head) loop."""
    dt = v_ref.dtype
    for b in range(BB):
        ps = []
        for h in range(H):
            logits = jnp.dot(qhat_ref[b, h], khat_ref[b, h],
                             preferred_element_type=jnp.float32)
            logits = logits + proj_ref[b][:, Cdz + h, :].astype(jnp.float32)
            m = jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp(logits - m)
            p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dt)
            ps.append(p)
            o_ref[b, h] = jnp.dot(p, v_ref[b, h],
                                  preferred_element_type=jnp.float32).astype(dt)
            opt_ref[b, h] = jax.lax.dot_general(
                p, vf_ref[b, h], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dt)
        p_all = jnp.stack(ps, axis=1)
        opair_ref[b] = jax.lax.dot_general(
            p_all, proj_ref[b][:, :Cdz, :], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(dt)


def _kern_batched_bb(qhat_ref, khat_ref, v_ref, vf_ref, proj_ref,
                     o_ref, opt_ref, opair_ref, *, H, Cdz, BB):
    """Multi-batch-row block + head-batched dots: (BB*H)-way dot_general."""
    dt = v_ref.dtype
    Qb = qhat_ref.shape[2]
    L = khat_ref.shape[3]
    D2 = qhat_ref.shape[3]
    C = v_ref.shape[3]
    Pv3 = vf_ref.shape[2]
    qh = qhat_ref[...].reshape(BB * H, Qb, D2)
    kh = khat_ref[...].reshape(BB * H, D2, L)
    logits = jax.lax.dot_general(
        qh, kh, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)            # (BB*H, Qb, L)
    bias = proj_ref[...][:, :, Cdz:, :]                # (BB, Qb, H, L)
    bias = bias.transpose(0, 2, 1, 3).reshape(BB * H, Qb, L)
    logits = logits + bias.astype(jnp.float32)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(dt)
    o_ref[...] = jax.lax.dot_general(
        p, v_ref[...].reshape(BB * H, L, C), (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(dt).reshape(BB, H, Qb, C)
    opt_ref[...] = jax.lax.dot_general(
        p, vf_ref[...].reshape(BB * H, Pv3, L), (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(dt).reshape(BB, H, Qb, Pv3)
    p_all = p.reshape(BB, H, Qb, L).transpose(0, 2, 1, 3).reshape(BB * Qb, H, L)
    pz = proj_ref[...][:, :, :Cdz, :].reshape(BB * Qb, Cdz, L)
    opair_ref[...] = jax.lax.dot_general(
        p_all, pz, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(dt).reshape(BB, Qb, H, Cdz)


def call_variant(kern, ops, qb, bb=1, vmem=64 * 1024 * 1024, **kw):
    qhat, khat, v4, vf4, proj = ops
    B, H, Qtot, D2 = qhat.shape
    L = khat.shape[-1]
    C = v4.shape[-1]
    Pv3 = vf4.shape[2]
    Cdz = proj.shape[2] - H
    dt = v4.dtype
    k = functools.partial(kern, H=H, Cdz=Cdz, **kw)
    return pl.pallas_call(
        k,
        compiler_params=_cp(vmem),
        grid=(B // bb, Qtot // qb),
        in_specs=[
            pl.BlockSpec((bb, H, qb, D2), lambda b, i: (b, 0, i, 0)),
            pl.BlockSpec((bb, H, D2, L), lambda b, i: (b, 0, 0, 0)),
            pl.BlockSpec((bb, H, L, C), lambda b, i: (b, 0, 0, 0)),
            pl.BlockSpec((bb, H, Pv3, L), lambda b, i: (b, 0, 0, 0)),
            pl.BlockSpec((bb, qb, Cdz + H, L), lambda b, i: (b, i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bb, H, qb, C), lambda b, i: (b, 0, i, 0)),
            pl.BlockSpec((bb, H, qb, Pv3), lambda b, i: (b, 0, i, 0)),
            pl.BlockSpec((bb, qb, H, Cdz), lambda b, i: (b, i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Qtot, C), dt),
            jax.ShapeDtypeStruct((B, H, Qtot, Pv3), dt),
            jax.ShapeDtypeStruct((B, Qtot, H, Cdz), dt),
        ],
    )(qhat, khat, v4, vf4, proj)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=64)
    ap.add_argument("--L", type=int, default=128)
    ap.add_argument("--qb", type=int, default=128)
    ns = ap.parse_args()
    B, L, H, C, Pq, Pv, Cz = ns.B, ns.L, 8, 256, 8, 12, 128
    dt = jnp.bfloat16
    print(f"device: {jax.devices()[0].platform}, B={B} L={L} qb={ns.qb} bf16")

    raw = make_args(B, L, H, C, Pq, Pv, Cz, dt)
    ops = _prep(*raw[:6], *raw[6:11], raw[11], raw[12], 1e5)
    ops = tuple(jax.device_put(o) for o in ops)

    def prepped_variant(kern, qb, bb=1, **kw):
        def fn(qhat, *rest):
            return call_variant(kern, (qhat,) + rest, qb, bb=bb, **kw)
        return fn

    # Reference output for correctness
    want = IA._core_reference(*ops)

    variants = [
        ("loop (production)", prepped_variant(_kern_loop, ns.qb), True),
        ("loop, no opair", prepped_variant(_kern_loop, ns.qb,
                                           with_opair=False), False),
        ("loop, no opt", prepped_variant(_kern_loop, ns.qb,
                                         with_opt=False), False),
        ("loop, no bias", prepped_variant(_kern_loop, ns.qb,
                                          with_bias=False), False),
        ("head-batched dots", prepped_variant(_kern_batched, ns.qb), True),
        ("loop bb=4", prepped_variant(_kern_loop_bb, ns.qb, bb=4, BB=4), True),
        ("batched bb=2", prepped_variant(_kern_batched_bb, ns.qb, bb=2, BB=2),
         True),
        ("batched bb=4", prepped_variant(_kern_batched_bb, ns.qb, bb=4, BB=4),
         True),
        ("batched bb=8", prepped_variant(_kern_batched_bb, ns.qb, bb=8, BB=8,
                                         vmem=100 * 1024 * 1024), True),
    ]
    for name, fn, check in variants:
        try:
            ms = timeit(jax.jit(fn), ops)
            err = ""
            if check:
                got = jax.jit(fn)(*ops)
                err = max(float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                                - b.astype(jnp.float32))))
                          for a, b in zip(got, want))
                err = f"   max|err| {err:.3e}"
            print(f"{name:24s} {ms:7.3f} ms{err}")
        except Exception as e:
            print(f"{name:24s} FAILED: {str(e).splitlines()[0][:120]}")


if __name__ == "__main__":
    main()


def bench_oracle(B=64, L=128):
    """Time the XLA oracle on PREPPED operands (proj consumed, no z read)."""
    H, C, Pq, Pv, Cz = 8, 256, 8, 12, 128
    dt = jnp.bfloat16
    raw = make_args(B, L, H, C, Pq, Pv, Cz, dt)
    ops = _prep(*raw[:6], *raw[6:11], raw[11], raw[12], 1e5)
    ops = tuple(jax.device_put(o) for o in ops)
    ms = timeit(jax.jit(IA._core_reference), ops)
    print(f"oracle-on-prepped B={B} L={L}: {ms:7.3f} ms")


def timeit_raw(fn, args, iters):
    @jax.jit
    def chained(q, *rest):
        def step(carry, _):
            outs = fn(carry, *rest)
            extra = sum(jnp.sum(o.astype(jnp.float32)) for o in outs)
            return carry + (extra * 1e-12).astype(carry.dtype), ()
        out, _ = jax.lax.scan(step, q, None, length=iters)
        return jnp.sum(out.astype(jnp.float32))
    q0 = args[0]
    float(chained(q0 + jnp.asarray(1.0, q0.dtype), *args[1:]))
    t0 = time.perf_counter()
    float(chained(*args))
    return (time.perf_counter() - t0) * 1e3  # TOTAL ms


def bench_slope(B=64, L=128):
    """Slope timing: total(80) - total(20) over 60 iters, plus a trivial-op
    harness floor at the same shapes."""
    H, C, Pq, Pv, Cz = 8, 256, 8, 12, 128
    dt = jnp.bfloat16
    raw = make_args(B, L, H, C, Pq, Pv, Cz, dt)
    ops = _prep(*raw[:6], *raw[6:11], raw[11], raw[12], 1e5)
    ops = tuple(jax.device_put(o) for o in ops)

    def trivial(qhat, khat, v4, vf4, proj):
        return (qhat * jnp.asarray(1.0001, qhat.dtype),)

    for name, fn in [("trivial", trivial),
                     ("oracle", IA._core_reference),
                     ("kernel", lambda *o: IA._core_fwd_call(*o, 128 if L == 128 else 64))]:
        try:
            t20 = timeit_raw(fn, ops, 20)
            t80 = timeit_raw(fn, ops, 80)
            slope = (t80 - t20) / 60
            print(f"B={B} L={L} {name:8s} total20 {t20:8.2f} ms  total80 "
                  f"{t80:8.2f} ms  slope {slope:7.3f} ms/iter")
        except Exception as e:
            print(f"B={B} L={L} {name:8s} FAILED: {str(e).splitlines()[0][:100]}")
