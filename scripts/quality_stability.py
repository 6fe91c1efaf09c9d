#!/usr/bin/env python
"""Seed-to-seed distributional stability of the sampler on a target.

Samples two independent ensembles (different seeds) with the same
checkpoint and reports the JS divergences between them — the noise floor
any cross-code-path or cross-precision equivalence claim must be measured
against (BASELINE.md "quality stability"). With --compare-dir, instead
compares the fresh ensemble against a previously saved one (e.g. another
branch/precision/kernel path).

Usage:
  python scripts/quality_stability.py --ckpt outputs/ckpt/best \
      --target testdata/CLN025.pdb --n-conf 200 [--seeds 2 4] \
      [--dtype bfloat16] [--out /tmp/qs]
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from str2str_tpu.utils.jax_setup import setup as _jax_setup
_jax_setup()

import jax


def sample_ensemble(cfg, params, sampler, feats, seed: int, n_conf: int,
                    chained: bool = False):
    """Full delta-grid protocol; returns CA coords (n_conf_total, L, 3)."""
    fn = sampler.sample_ensemble_chained if chained else sampler.sample_ensemble
    ens = fn(params, jax.random.PRNGKey(seed), feats,
             n_replica=max(1, n_conf // len(sampler.cfg.delta_range())))
    atom37 = np.concatenate([v for _, v in sorted(ens.items())], axis=0)
    return atom37[:, :, 1, :]  # CA


def js_metrics(ca_a: np.ndarray, ca_b: np.ndarray) -> dict:
    from str2str_tpu.evaluation import metrics as M
    d = {"target": ca_b, "pred": ca_a}
    return {
        "js_pwd": M.js_pwd(d)["pred"],
        "js_rg": M.js_rg(d)["pred"],
        "js_tica": M.js_tica(d, return_tic=False)["pred"],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--target", default="testdata/CLN025.pdb")
    ap.add_argument("--n-conf", type=int, default=200)
    ap.add_argument("--seeds", type=int, nargs=2, default=(2, 4))
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--num-timesteps", type=int, default=1000)
    ap.add_argument("--replica-per-batch", type=int, default=20)
    ap.add_argument("--compare-npy", default=None,
                    help="compare seed-A ensemble against this saved CA .npy "
                         "instead of sampling a second seed")
    ap.add_argument("--save-npy", default=None,
                    help="save the seed-A CA ensemble here")
    ap.add_argument("--chained", action="store_true",
                    help="chained-delta single-program sampler (one compile)")
    ap.add_argument("--override", action="append", default=[],
                    help="extra config override(s), e.g. "
                         "model.net.edge_dots_int8=true")
    args = ap.parse_args()

    from str2str_tpu.config.core import load_config
    from str2str_tpu.data.featurize import FeaturizeConfig, featurize_padded, pick_bucket
    from str2str_tpu.factory import build_diffuser, build_network, build_sampler, load_params
    from str2str_tpu.io import protein as prot_io
    from str2str_tpu.cli.sample import example_net_batch

    cfg = load_config("eval", [
        f"ckpt_path={args.ckpt}",
        f"model.net.dtype={args.dtype}",
        f"model.inference.num_timesteps={args.num_timesteps}",
        f"model.inference.replica_per_batch={args.replica_per_batch}",
    ] + args.override)
    net = build_network(cfg)
    diffuser = build_diffuser(cfg)
    sampler = build_sampler(cfg, net, diffuser)

    prot = prot_io.from_pdb_string(Path(args.target).read_text())
    feats = featurize_padded(
        prot, FeaturizeConfig(strip_missing_residues=True,
                              recenter_and_scale=False),
        bucket=pick_bucket(prot.num_residues, (64, 128, 256, 384, 512)))
    params = load_params(cfg, net, example_net_batch(feats))

    n_res = prot.num_residues
    ca_a = sample_ensemble(cfg, params, sampler, feats,
                           args.seeds[0], args.n_conf,
                           chained=args.chained)[:, :n_res]
    if args.save_npy:
        np.save(args.save_npy, ca_a)
    if args.compare_npy:
        ca_b = np.load(args.compare_npy)
        label = f"seed{args.seeds[0]}-vs-{Path(args.compare_npy).name}"
    else:
        ca_b = sample_ensemble(cfg, params, sampler, feats,
                               args.seeds[1], args.n_conf,
                               chained=args.chained)[:, :n_res]
        label = f"seed{args.seeds[0]}-vs-seed{args.seeds[1]}"

    out = {"target": Path(args.target).stem, "comparison": label,
           "n_conf": int(ca_a.shape[0]), "dtype": args.dtype,
           "ckpt": args.ckpt, **js_metrics(ca_a, ca_b)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
