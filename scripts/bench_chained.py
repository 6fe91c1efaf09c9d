#!/usr/bin/env python
"""Attribute the chained-sampler per-step overhead vs the plain anneal scan.

Motivation (round 5): the 13-target eval runs the chained multi-target
program at ~13.5 ms/step (L=64, B=50) while bench.py's plain single-delta
scan runs 6.7 ms/step at the SAME shape — the L_pad=64 bucket's wall is
dominated by whatever the chained step does that the plain step does not
(segment-init/slot-write lax.conds over the (S, B, L, 37, 3) output buffers,
extra per-step key folds, bounded-dispatch chunking), NOT by the missing
Pallas kernels.

Times whole jitted programs at two schedule lengths and reports the slope
ms/step, so compile + dispatch + transfer costs subtract out:

  plain        sampler.run, delta=0.5
  chain-1seg   run_chained, deltas=[0.5] (1-2 slots: tiny buffers)
  chain-grid   run_chained, full 10-delta grid (10 slots: eval-like buffers)

Usage: python scripts/bench_chained.py [--L 64] [--B 50]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from str2str_tpu.utils.jax_setup import setup as _jax_setup
_jax_setup()

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--L", type=int, default=64)
    ap.add_argument("--B", type=int, default=50)
    ns = ap.parse_args()
    L, B = ns.L, ns.B

    from bench import synthetic_protein
    from str2str_tpu.cli.sample import example_net_batch
    from str2str_tpu.config.core import load_config
    from str2str_tpu.factory import build_diffuser, build_network, build_sampler
    from str2str_tpu.sampling.sampler import build_chained_schedule, build_schedule

    cfg = load_config("eval", [])
    net = build_network(cfg)
    diffuser = build_diffuser(cfg)
    sampler = build_sampler(cfg, net, diffuser)

    feats = synthetic_protein(L)
    batch = {k: jnp.asarray(np.broadcast_to(v, (B,) + v.shape))
             for k, v in feats.items() if isinstance(v, np.ndarray)}
    params = net.init(jax.random.PRNGKey(0), example_net_batch(feats))
    print(f"device={jax.devices()[0].platform} L={L} B={B} "
          f"dtype={cfg.model.net.dtype}")

    def timed(fn, *args):
        out = fn(*args)
        jax.block_until_ready(jax.tree.leaves(out)[0])
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(jax.tree.leaves(out)[0])
        return time.perf_counter() - t0

    def plain_run(nt):
        ts, dt, active = build_schedule(
            np.full((B,), 0.5, np.float32), nt, 0.01)
        steps = ts.shape[0] + 1
        return timed(sampler.run, params, jax.random.PRNGKey(1), batch,
                     ts, dt, active), steps

    def chained_run(deltas, nt, repeats=1):
        sched, n_slots = build_chained_schedule(
            np.asarray(deltas, np.float32), repeats, nt, 0.01)
        steps = sched["ts"].shape[0]
        keys = ("ts", "dt", "init", "final", "slot", "local")
        t = timed(sampler.run_chained, params, jax.random.PRNGKey(1), batch,
                  n_slots, *(jnp.asarray(sched[k]) for k in keys))
        return t, steps

    rows = {}

    t1, s1 = plain_run(500)
    t2, s2 = plain_run(1000)
    rows["plain"] = (t2 - t1) / (s2 - s1) * 1e3

    t1, s1 = chained_run([0.5], 500)
    t2, s2 = chained_run([0.5], 1000)
    rows["chain-1seg"] = (t2 - t1) / (s2 - s1) * 1e3

    grid = np.around(np.arange(0.25, 0.701, 0.05), 2)
    t1, s1 = chained_run(grid, 100)
    t2, s2 = chained_run(grid, 200)
    rows["chain-grid(10 slots)"] = (t2 - t1) / (s2 - s1) * 1e3

    for k, v in rows.items():
        print(f"{k:24s} {v:7.3f} ms/step  ({v / B * 1e3:.0f} us/NFE, "
              f"{B / v * 1e3:.0f} NFE/s)")


if __name__ == "__main__":
    main()
