#!/usr/bin/env python
"""End-to-end wall-clock benchmark of the sampling CLI at L=256.

Backs the extrapolated NFE-rate headline (bench.py) with one REAL run: a
synthetic 256-residue protein is written to disk as a PDB, then
`cli.sample` runs the full reference protocol (delta grid 0.25..0.70 step
0.05, T = int(num_timesteps*delta), self-conditioning, prob-flow ODE,
n_replica replicas per delta) including host featurization, scheduling, and
multi-model PDB write-out. Reports measured end-to-end conf/s next to what
the NFE-rate arithmetic predicts for the same protocol.

First run compiles ~10 anneal-scan shapes through the tunnel (3-10 min
each); rerun to measure with a warm persistent compilation cache, or pass
--skip-compile-run.

Usage: python scripts/bench_e2e.py [--n-replica 100] [--rpb 50]
       [--num-timesteps 1000] [--nfe-rate 1035]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from str2str_tpu.utils.jax_setup import setup as _jax_setup
_jax_setup()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-replica", type=int, default=100)
    ap.add_argument("--rpb", type=int, default=50)
    ap.add_argument("--num-timesteps", type=int, default=1000)
    ap.add_argument("--nfe-rate", type=float, default=None,
                    help="measured NFE/s (bench.py) to compare against")
    ap.add_argument("--out", default="/tmp/bench_e2e")
    ap.add_argument("--chained", action="store_true",
                    help="use the chained-delta single-program sampler "
                         "(one compile + one first-dispatch instead of ~10)")
    args = ap.parse_args()

    from bench import synthetic_protein_object
    from str2str_tpu.io import protein as prot_io
    from str2str_tpu.cli import sample as sample_cli

    prot = synthetic_protein_object(256)
    pdb_path = Path(args.out) / "synth256.pdb"
    pdb_path.parent.mkdir(parents=True, exist_ok=True)
    pdb_path.write_text(prot_io.to_pdb(prot))

    overrides = [
        f"data.dataset.path_to_dataset={pdb_path}",
        "data.buckets=[256]",
        "model.net.dtype=bfloat16",
        f"model.inference.num_timesteps={args.num_timesteps}",
        f"model.inference.n_replica={args.n_replica}",
        f"model.inference.replica_per_batch={args.rpb}",
        f"model.inference.output_dir={args.out}/samples",
        "seed=3",
    ]
    if args.chained:
        overrides.append("model.inference.chained=true")
    t0 = time.perf_counter()
    sample_cli.main(overrides)
    wall = time.perf_counter() - t0

    deltas = np.around(np.arange(0.25, 0.70 + 1e-5, 0.05), 2)
    n_chunks = -(-args.n_replica // args.rpb)
    total_conf = len(deltas) * args.n_replica
    # per chunk of rpb replicas: T-1 reverse + init + final = T+1 net calls
    total_nfe = sum(
        (max(int(args.num_timesteps * d), 2) + 1) * args.rpb * n_chunks
        for d in deltas)
    out = {
        "metric": "end-to-end conf/s (cli.sample, full delta grid, incl. "
                  "featurization + PDB write)",
        "conf": total_conf,
        "wall_s": round(wall, 1),
        "value": round(total_conf / wall, 3),
        "unit": "conf/s",
        "total_nfe": total_nfe,
        "e2e_nfe_per_sec": round(total_nfe / wall, 1),
    }
    if args.nfe_rate:
        pred_wall = total_nfe / args.nfe_rate
        out["predicted_wall_s_from_nfe_rate"] = round(pred_wall, 1)
        out["e2e_over_predicted"] = round(wall / pred_wall, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
