#!/usr/bin/env python
"""Sample the 13 in-repo targets with the trained round-3 checkpoint and
report per-target validity metrics (steric-clash and CA-CA bond validity)
plus ensemble diversity (mean pairwise CA-RMSD and mean RMSD to the input
structure).

The MD-reference JS metrics (js_pwd/js_tica/js_rg) need the DESRES
trajectories, which are not shipped in this image — validity and diversity
are the reference-free columns of the reference's eval protocol
(reference src/eval.py:64-70, metrics.py:106-137). Diversity is evidence
the trained model actually perturbs: Str2Str's deliverable is heterogeneous
ensembles, not copies of the input.

Usage: python scripts/eval_trained.py [--n-replica 100] [--out outputs/eval_trained]
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


def ca_rmsd_matrix_mean(ca: np.ndarray, n_pairs: int = 2000,
                        seed: int = 0) -> float:
    """Mean pairwise aligned CA-RMSD over random conformation pairs."""
    from str2str_tpu.geometry.align import rmsd
    import jax.numpy as jnp
    rng = np.random.RandomState(seed)
    n = ca.shape[0]
    i = rng.randint(0, n, n_pairs)
    j = rng.randint(0, n, n_pairs)
    keep = i != j
    i, j = i[keep], j[keep]
    r = rmsd(jnp.asarray(ca[i]), jnp.asarray(ca[j]))
    return float(np.mean(np.asarray(r)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-replica", type=int, default=100)
    ap.add_argument("--out", default="outputs/eval_trained")
    ap.add_argument("--ckpt", default="checkpoints/trained_r3.npz")
    ap.add_argument("--skip-sampling", action="store_true",
                    help="reuse PDBs already under --out/samples")
    ap.add_argument("--chained", action="store_true",
                    help="chained-delta single-program sampler (one compile "
                         "per length bucket instead of ~10)")
    args = ap.parse_args()

    from str2str_tpu.cli import sample as sample_cli
    from str2str_tpu.evaluation import metrics as M
    from str2str_tpu.geometry.align import rmsd
    from str2str_tpu.io import pdb as pdb_io
    import jax.numpy as jnp

    out = Path(args.out)
    sample_dir = out / "samples"
    t0 = time.perf_counter()
    if not args.skip_sampling:
        sample_cli.main([
            "data.dataset.path_to_dataset=testdata",
            f"ckpt_path={args.ckpt}",
            "model.net.dtype=bfloat16",
            f"model.inference.n_replica={args.n_replica}",
            "model.inference.replica_per_batch=50",
            f"model.inference.output_dir={sample_dir}",
            "seed=11",
        ] + (["model.inference.chained=true"] if args.chained else []))
    wall = time.perf_counter() - t0

    rows = []
    for pred in sorted((sample_dir / "all_delta").glob("*.pdb")):
        code = pred.stem
        ca = pdb_io.extract_backbone_coords(str(pred), atoms=("CA",))
        ca_in = pdb_io.extract_backbone_coords(
            str(Path("testdata") / f"{code}.pdb"), atoms=("CA",))[0]
        n = min(ca.shape[1], ca_in.shape[0])
        ca, ca_in = ca[:, :n], ca_in[:n]

        d = {"target": code, "n_conf": int(ca.shape[0]), "len": int(ca.shape[1])}
        vd = M.validity({"pred": ca})
        bd = M.bonding_validity({"pred": ca})
        d["val_clash"] = round(float(vd["pred"]), 4)
        d["val_bond"] = round(float(bd["pred"]), 4)
        d["div_pw_rmsd"] = round(ca_rmsd_matrix_mean(ca), 3)
        r_in = rmsd(jnp.asarray(ca),
                    jnp.broadcast_to(jnp.asarray(ca_in), ca.shape))
        d["rmsd_to_input"] = round(float(np.mean(np.asarray(r_in))), 3)
        rows.append(d)
        print(json.dumps(d))

    cols = ["target", "n_conf", "len", "val_clash", "val_bond",
            "div_pw_rmsd", "rmsd_to_input"]
    out.mkdir(parents=True, exist_ok=True)
    with open(out / "validity_metrics.tsv", "w") as f:
        f.write("\t".join(cols) + "\n")
        for d in rows:
            f.write("\t".join(str(d[c]) for c in cols) + "\n")
        means = {c: np.mean([d[c] for d in rows]) for c in cols[3:]}
        f.write("mean\t\t\t" + "\t".join(f"{means[c]:.4f}" for c in cols[3:])
                + "\n")
    print(json.dumps({"wall_s": round(wall, 1), "targets": len(rows),
                      **{f"mean_{c}": round(float(means[c]), 4)
                         for c in cols[3:]}}))


if __name__ == "__main__":
    main()
