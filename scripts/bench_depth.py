#!/usr/bin/env python
"""Forward decomposition with ZERO harness artifacts: vary trunk depth and
fit the real sampler-scan step time against block count.

The anneal scan has genuine data dependencies (state feeds the next step),
so slope-timing two scan lengths measures the true per-step cost; running
it at no_ipa_blocks = 1..4 then gives

    ms/step(depth) = fixed + per_block * depth

where `fixed` covers the embedder, diffuser reverse step, self-conditioning
plumbing and backbone math, and `per_block` is one full trunk block
(IPA + node transformer + transition [+ EdgeTransition on all but the last
block] — the depth fit naturally attributes the EdgeTransition count
(depth-1) into per_block + a -1 block correction in `fixed`).

Kernel on/off variants decompose within the block. Usage:
    python scripts/bench_depth.py [--depths 1,2,3,4] [--variants all]
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

import bench as B  # reuse the synthetic protein + config machinery


def step_time_ms(depth: int, use_pallas: str, use_pallas_ipa: str,
                 L: int, Bsz: int, t_short: int = 60, t_long: int = 240) -> float:
    from str2str_tpu.config.core import load_config
    from str2str_tpu.factory import build_diffuser, build_network, build_sampler
    from str2str_tpu.sampling.sampler import build_schedule
    from str2str_tpu.cli.sample import example_net_batch

    cfg = load_config("eval", [
        f"model.net.no_ipa_blocks={depth}",
        f"model.net.use_pallas={use_pallas}",
        f"model.net.use_pallas_ipa={use_pallas_ipa}",
    ])
    net = build_network(cfg)
    diffuser = build_diffuser(cfg)
    sampler = build_sampler(cfg, net, diffuser)

    feats = B.synthetic_protein(L)
    batch = {k: jnp.asarray(np.broadcast_to(v, (Bsz,) + v.shape))
             for k, v in feats.items() if isinstance(v, np.ndarray)}
    params = net.init(jax.random.PRNGKey(0), example_net_batch(feats))

    def run_s(t_steps: int, key: int) -> float:
        ts, dt, active = build_schedule(
            np.full((Bsz,), 0.5, np.float32), int(t_steps / 0.5), 0.01)
        out = sampler.run(params, jax.random.PRNGKey(key), batch,
                          ts, dt, active)
        jax.block_until_ready(out["atom37"])  # warm (compile)
        t0 = time.perf_counter()
        out = sampler.run(params, jax.random.PRNGKey(key + 1), batch,
                          ts, dt, active)
        float(jnp.sum(out["atom37"]))
        return time.perf_counter() - t0

    s_short = run_s(t_short, 10)
    s_long = run_s(t_long, 20)
    return (s_long - s_short) / (t_long - t_short) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--depths", default="1,2,3,4")
    ap.add_argument("--L", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--variants", default="fused",
                    help="comma list of fused,xla,noedge,noipa or 'all'")
    ns = ap.parse_args()
    depths = [int(x) for x in ns.depths.split(",")]
    variants = {
        "fused": ("auto", "auto"),
        "xla": ("off", "off"),
        "noedge": ("off", "auto"),   # XLA edge path, fused IPA
        "noipa": ("auto", "off"),    # fused edge, XLA IPA
    }
    names = list(variants) if ns.variants == "all" else ns.variants.split(",")

    print(f"device: {jax.devices()[0].platform}, B={ns.batch} L={ns.L} "
          f"(per-step ms of the real anneal scan, slope-timed)")
    for name in names:
        up, upi = variants[name]
        times = []
        for d in depths:
            t = step_time_ms(d, up, upi, ns.L, ns.batch)
            times.append(t)
            print(f"  {name:7s} depth={d}: {t:7.3f} ms/step", flush=True)
        if len(depths) >= 2:
            fit = np.polyfit(depths, times, 1)
            print(f"  {name:7s} fit: per_block={fit[0]:.3f} ms  "
                  f"fixed={fit[1]:.3f} ms")


if __name__ == "__main__":
    main()
