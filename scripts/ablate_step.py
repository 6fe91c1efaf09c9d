#!/usr/bin/env python
"""Attribute the per-step sampler cost: net forward vs diffuser vs glue.

The corrected component map models the forward as the sum of isolated
kernel/stage slope timings (bench_components.py); the measured NFE rate at
B=50/L=128 runs ~2 ms/step SLOWER than that sum. This probe slope-times the
REAL in-graph units at the protocol shapes:

  net        one ScoreNetwork.apply (exactly what the anneal scan calls)
  net+score  + SE3Diffusion.score (IGSO3 series + quat ops)
  full       + reverse step + masking (== the run() scan body w/o schedule)

so the (full - net) split is the diffuser's true per-step cost and
(net - modeled) is the component map's in-graph error. Measurement tool,
not part of the build.
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from str2str_tpu.utils.jax_setup import setup as _jax_setup
_jax_setup()

import jax
import jax.numpy as jnp
import numpy as np


def slope_time(fn, carry0, n_short=20, n_long=80):
    """fn: carry -> carry (same pytree). Returns ms/iter via two-point slope."""
    def total_ms(iters):
        @jax.jit
        def chained(c0):
            def step(c, _):
                return jax.lax.optimization_barrier(fn(c)), ()
            cf, _ = jax.lax.scan(step, c0, None, length=iters)
            return cf
        out = chained(carry0)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = chained(carry0)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) * 1e3

    return (total_ms(n_long) - total_ms(n_short)) / (n_long - n_short)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--L", type=int, default=128)
    ap.add_argument("--B", type=int, default=50)
    args = ap.parse_args()
    L, B = args.L, args.B

    from bench import synthetic_protein
    from str2str_tpu.config.core import load_config
    from str2str_tpu.factory import build_diffuser, build_network, build_sampler
    from str2str_tpu.cli.sample import example_net_batch
    from str2str_tpu.diffusion.se3 import FrameState

    cfg = load_config("eval", [])
    net = build_network(cfg)
    diffuser = build_diffuser(cfg)
    sampler = build_sampler(cfg, net, diffuser)

    feats = synthetic_protein(L)
    batch = {k: jnp.asarray(np.broadcast_to(v, (B,) + v.shape))
             for k, v in feats.items() if isinstance(v, np.ndarray)}
    params = net.init(jax.random.PRNGKey(0), example_net_batch(feats))

    residue_mask = batch["residue_mask"].astype(jnp.float32)
    fixed_mask = batch["fixed_mask"].astype(jnp.float32)
    diffuse_mask = (1.0 - fixed_mask) * residue_mask
    net_apply = sampler._make_net_apply(params, batch, residue_mask,
                                        fixed_mask)

    t = jnp.full((B,), 0.5, jnp.float32)
    dt = jnp.full((B,), 1e-3, jnp.float32)
    key = jax.random.PRNGKey(1)
    q0 = jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32), (B, L, 1))
    tr0 = jax.random.normal(jax.random.PRNGKey(2), (B, L, 3)) * 3.0
    state0 = FrameState(q0, tr0)
    sc0 = jnp.zeros((B, L, 3), jnp.float32)

    # Each variant carries (state, sc_ca): the net output feeds the next
    # iteration's state, so nothing operand-sized can be hoisted.
    def net_only(c):
        state, sc = c
        out = net_apply(state, sc, t)
        return FrameState(out["quat"], out["trans"]), out["trans"]

    def net_score(c):
        state, sc = c
        out = net_apply(state, sc, t)
        pred = FrameState(out["quat"], out["trans"])
        scores = diffuser.score(pred, state, t, mask=residue_mask)
        # fold scores into the carry so they are not DCE'd
        return (FrameState(pred.quat,
                           pred.trans + 0.0 * scores["trans_score"]
                           + 0.0 * scores["rot_score"]),
                out["trans"])

    def full_step(c):
        state, sc = c
        out = net_apply(state, sc, t)
        pred = FrameState(out["quat"], out["trans"])
        scores = diffuser.score(pred, state, t, mask=residue_mask)
        nxt = diffuser.reverse(
            key, state, scores["rot_score"], scores["trans_score"], t, dt,
            diffuse_mask=diffuse_mask, center_trans=True,
            center_mask=residue_mask, noise_scale=1.0, probability_flow=True)
        return nxt, out["trans"]

    print(f"device: {jax.devices()[0]}; B={B} L={L} "
          f"dtype={cfg['model']['net'].get('dtype')}")
    for name, fn in [("net", net_only), ("net+score", net_score),
                     ("full step", full_step)]:
        ms = slope_time(fn, (state0, sc0))
        print(f"  {name:>10}: {ms:7.3f} ms/iter")


if __name__ == "__main__":
    main()
