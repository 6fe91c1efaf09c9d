#!/usr/bin/env python
"""Capture a TPU profile of the in-graph net forward and dump op-level time.

The component map (scripts/bench_components.py) sums ISOLATED stage
timings; the measured in-graph forward at the protocol shape runs ~1.6 ms
slower than that sum. This probe profiles the REAL scanned forward (the
exact unit the anneal runs) with jax.profiler and aggregates the XLA op
breakdown via the tensorboard profile-plugin converter, attributing the
in-graph time XLA actually schedules — fusions, relayouts, copies — that
no isolated-stage bench can see. Measurement tool, not part of the build.

Usage: python scripts/profile_net.py [--B 50] [--L 128] [--steps 40]
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from str2str_tpu.utils.jax_setup import setup as _jax_setup
_jax_setup()

import jax
import jax.numpy as jnp
import numpy as np


def capture(B: int, L: int, steps: int, outdir: str) -> None:
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
    net_apply = sampler._make_net_apply(params, batch, residue_mask,
                                        fixed_mask)
    t = jnp.full((B,), 0.5, jnp.float32)
    q0 = jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32), (B, L, 1))
    tr0 = jax.random.normal(jax.random.PRNGKey(2), (B, L, 3)) * 3.0

    @jax.jit
    def chained(state0, sc0):
        def step(c, _):
            st, sc = c
            out = net_apply(st, sc, t)
            nxt = (FrameState(out["quat"], out["trans"]), out["trans"])
            return jax.lax.optimization_barrier(nxt), ()
        cf, _ = jax.lax.scan(step, (state0, sc0), None, length=steps)
        return cf

    args0 = (FrameState(q0, tr0), jnp.zeros((B, L, 3), jnp.float32))
    out = chained(*args0)          # compile + warm
    jax.block_until_ready(out)
    with jax.profiler.trace(outdir):
        out = chained(*args0)
        jax.block_until_ready(out)
    print(f"captured {steps}-step scan at B={B} L={L} -> {outdir}")


def find_xplanes(outdir: str):
    return sorted(glob.glob(os.path.join(
        outdir, "plugins", "profile", "*", "*.xplane.pb")))


def dump_op_stats(outdir: str, top: int) -> None:
    """Aggregate device op time from the captured xplane via the
    tensorboard profile plugin (tensorflow + plugin are in the image)."""
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    xplanes = find_xplanes(outdir)
    if not xplanes:
        print("no xplane captured (tunnel may not export device traces)")
        return
    for tool in ("framework_op_stats^", "op_profile^"):
        try:
            data, _ = rtd.xspace_to_tool_data(xplanes, tool, {})
        except Exception as e:  # tool names vary across plugin versions
            print(f"tool {tool}: {type(e).__name__}: {e}")
            continue
        name = tool.rstrip("^")
        path = os.path.join(outdir, f"{name}.json")
        if isinstance(data, bytes):
            try:
                data = gzip.decompress(data)
            except OSError:
                pass
            data = data.decode("utf-8", "replace")
        with open(path, "w") as f:
            f.write(data)
        print(f"wrote {path}")
        if name == "framework_op_stats":
            summarize_fw_stats(path, top)


def summarize_fw_stats(path: str, top: int) -> None:
    obj = json.load(open(path))
    # gviz table format: [0] is device table with cols/rows
    try:
        table = obj[0]
        cols = [c["label"] for c in table["cols"]]
        rows = [[c.get("v") for c in r["c"]] for r in table["rows"]]
    except Exception:
        print("unrecognized framework_op_stats layout; inspect the json")
        return
    i_type = cols.index("Type") if "Type" in cols else None
    i_name = cols.index("Operation") if "Operation" in cols else 0
    cand = [c for c in ("Total self-time (us)", "Total self time (us)",
                        "Total self-time (μs)") if c in cols]
    if not cand:
        print("cols:", cols)
        return
    i_self = cols.index(cand[0])
    by_type = defaultdict(float)
    total = 0.0
    for r in rows:
        t = float(r[i_self] or 0.0)
        total += t
        by_type[r[i_type] if i_type is not None else "?"] += t
    print(f"\n== device self-time by op type (total {total/1e3:.3f} ms) ==")
    for k, v in sorted(by_type.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {k:<40} {v/1e3:9.3f} ms  {100*v/total:5.1f}%")
    print(f"\n== top {top} individual ops ==")
    for r in sorted(rows, key=lambda r: -float(r[i_self] or 0))[:top]:
        print(f"  {float(r[i_self])/1e3:9.3f} ms  {str(r[i_name])[:100]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=50)
    ap.add_argument("--L", type=int, default=128)
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--outdir", default="/tmp/net_profile")
    ap.add_argument("--parse-only", action="store_true")
    args = ap.parse_args()
    if not args.parse_only:
        capture(args.B, args.L, args.steps, args.outdir)
    dump_op_stats(args.outdir, args.top)


if __name__ == "__main__":
    main()
