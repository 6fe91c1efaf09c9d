#!/usr/bin/env python
"""Train-step throughput: fused Pallas kernels (hand-written backwards) vs
the plain XLA path, at B=8 L=256 bf16.

Methodology (see BASELINE.md / the axon-tunnel timing rules): K train steps
are chained in ONE on-device `lax.scan` dispatch (Trainer.train_steps_scan)
with the params pytree as the carry, so per-call tunnel overhead is
amortized and nothing can be hoisted; two scan lengths are timed and the
SLOPE gives the marginal per-step cost. Warmup runs use a different PRNG key
than the timed runs (the remote execution service memoizes identical
(program, input) pairs).

Usage: python scripts/bench_train_step.py [--fp32] [--batch B] [--len L]
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


def build(dtype: str, use_fused: bool, L: int):
    from str2str_tpu.config.core import load_config
    from str2str_tpu.factory import build_diffuser, build_network
    from str2str_tpu.training.losses import LossConfig
    from str2str_tpu.training.trainer import TrainConfig, Trainer

    cfg = load_config("train", [f"model.net.dtype={dtype}"])
    net = build_network(cfg)
    diffuser = build_diffuser(cfg)
    tcfg = TrainConfig(use_fused_kernels=use_fused, num_devices=1)
    tr = Trainer(net, diffuser, LossConfig(), tcfg,
                 log_dir="/tmp/bench_train/logs", ckpt_dir="/tmp/bench_train/ckpt")
    tr.compile()
    return tr


def host_batch(B: int, L: int, seed: int = 0):
    sys.path.insert(0, str(REPO))
    from bench import synthetic_protein
    feats = synthetic_protein(L, seed=seed)
    batch = {k: np.broadcast_to(v, (B,) + v.shape).copy()
             for k, v in feats.items() if isinstance(v, np.ndarray)}
    return batch


def time_scan(tr, params, opt_state, stacked, key) -> float:
    t0 = time.perf_counter()
    p, o, metrics = tr.train_steps_scan(params, opt_state, key, stacked)
    _ = float(np.asarray(metrics["loss"])[-1])  # force to host
    return time.perf_counter() - t0, p, o


def measure(use_fused: bool, dtype: str, B: int, L: int, k_lo=4, k_hi=12):
    from str2str_tpu.parallel import mesh as mesh_lib
    tr = build(dtype, use_fused, L)
    batch = host_batch(B, L)
    params = tr.net.init(jax.random.PRNGKey(0), {
        "rigids_t": jnp.tile(jnp.asarray([1.0, 0, 0, 0, 0, 0, 0]), (B, L, 1)),
        "t": jnp.full((B,), 0.5),
        "residue_idx": jnp.asarray(batch["residue_idx"]),
        "residue_mask": jnp.asarray(batch["residue_mask"], jnp.float32),
        "fixed_mask": jnp.asarray(batch["fixed_mask"], jnp.float32),
        "sc_ca_t": jnp.zeros((B, L, 3)),
        "torsion_angles_sin_cos": jnp.asarray(
            batch["torsion_angles_sin_cos"], jnp.float32),
        "aatype": jnp.asarray(batch["aatype"]),
    })
    opt_state = tr.optimizer.init(params)

    results = {}
    # train_steps_scan donates (params, opt_state): always feed the evolved
    # pair forward, never a consumed buffer.
    p, o = params, opt_state
    for K in (k_lo, k_hi):
        stacked = {k: np.stack([v] * K) for k, v in batch.items()}
        sharded = mesh_lib.shard_stacked_batch(stacked, tr.mesh)
        # compile + warmup on a different key than the timed calls
        _, p, o = time_scan(tr, p, o, sharded, jax.random.PRNGKey(100 + K))
        dt1, p, o = time_scan(tr, p, o, sharded, jax.random.PRNGKey(200 + K))
        dt2, p, o = time_scan(tr, p, o, sharded, jax.random.PRNGKey(300 + K))
        results[K] = min(dt1, dt2)
        print(f"  [{'fused' if use_fused else 'xla  '}] K={K}: "
              f"{results[K]:.3f}s", flush=True)
    per_step = (results[k_hi] - results[k_lo]) / (k_hi - k_lo)
    return per_step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--len", type=int, default=256)
    args = ap.parse_args()
    dtype = "float32" if args.fp32 else "bfloat16"
    print(f"train-step benchmark: B={args.batch} L={args.len} {dtype}")

    xla = measure(False, dtype, args.batch, args.len)
    print(f"XLA path:   {xla * 1e3:.1f} ms/step")
    fused = measure(True, dtype, args.batch, args.len)
    print(f"fused path: {fused * 1e3:.1f} ms/step")
    print(f"speedup: {xla / fused:.2f}x "
          f"({'fused FASTER' if fused < xla else 'fused slower'})")


if __name__ == "__main__":
    main()
