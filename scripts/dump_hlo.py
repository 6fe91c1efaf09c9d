#!/usr/bin/env python
"""Dump the optimized HLO of the scanned net forward (TPU backend).

Companion to scripts/profile_net.py: the profile's op names (fusion.NNN,
copy.NNN, ...) resolve to shapes + JAX source metadata in this text, which
is what attributes the XLA-glue milliseconds between the Pallas kernels.
Measurement tool, not part of the build.
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from str2str_tpu.utils.jax_setup import setup as _jax_setup
_jax_setup()

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=50)
    ap.add_argument("--L", type=int, default=128)
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--out", default="/tmp/net_hlo.txt")
    args = ap.parse_args()
    B, L = args.B, args.L

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
        cf, _ = jax.lax.scan(step, (state0, sc0), None, length=args.steps)
        return cf

    args0 = (FrameState(q0, tr0), jnp.zeros((B, L, 3), jnp.float32))
    compiled = chained.lower(*args0).compile()
    text = compiled.as_text()
    Path(args.out).write_text(text)
    print(f"wrote {args.out} ({len(text)} bytes)")


if __name__ == "__main__":
    main()
