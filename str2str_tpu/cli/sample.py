"""Sampling CLI: zero-shot conformation ensembles from input structures.

Equivalent of the reference `python src/eval.py task_name=inference`
(eval.py:102-161 + predict_step): for every input PDB, run the
forward-perturb/reverse-anneal over the delta grid and write per-delta and
merged multi-model PDB ensembles.

Usage:
    python -m str2str_tpu.cli.sample [data.dataset.path_to_dataset=testdata]
        [ckpt_path=...] [model.inference.n_replica=100] [...]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

import jax

from ..utils.jax_setup import setup as _jax_setup
_jax_setup()
import numpy as np

from ..config.core import load_config, parse_cli
from ..data.featurize import FeaturizeConfig, featurize_padded, pick_bucket
from ..data.dataset import ProteinDataset
from ..factory import build_diffuser, build_network, build_sampler, load_params
from ..io import pdb as pdb_io
from ..utils.logging import get_logger

log = get_logger(__name__)


def example_net_batch(feats):
    import jax.numpy as jnp
    L = feats["aatype"].shape[0]
    return {
        "rigids_t": jnp.tile(jnp.asarray([1.0, 0, 0, 0, 0, 0, 0]), (1, L, 1)),
        "t": jnp.ones((1,)) * 0.5,
        "residue_idx": jnp.asarray(feats["residue_idx"])[None],
        "residue_mask": jnp.asarray(feats["residue_mask"])[None],
        "fixed_mask": jnp.asarray(feats["fixed_mask"])[None],
        "sc_ca_t": jnp.asarray(feats["sc_ca_t"])[None],
        "torsion_angles_sin_cos": jnp.asarray(feats["torsion_angles_sin_cos"])[None],
        "aatype": jnp.asarray(feats["aatype"])[None],
    }


def run(cfg) -> str:
    t_cfg = cfg.data.dataset.transform
    feat_cfg = FeaturizeConfig(
        strip_missing_residues=t_cfg.strip_missing_residues,
        recenter_and_scale=t_cfg.recenter_and_scale,
        truncate_length=t_cfg.truncate_length)
    ds = ProteinDataset(
        str(cfg.data.dataset.path_to_dataset),
        suffix=cfg.data.dataset.get("suffix", "pdb"),
        transform=feat_cfg,
        accession_codes=cfg.data.dataset.get("accession_code_filter"))

    net = build_network(cfg)
    diffuser = build_diffuser(cfg)
    sampler = build_sampler(cfg, net, diffuser)
    n_dev = int(cfg.model.inference.get("num_devices", 1) or 1)
    if n_dev != 1 and len(jax.devices()) > 1:
        if sampler.seq_mesh is not None:
            # Same invariant Sampler.__init__ asserts: the sequence mesh
            # column-shards the trunk over every device, so a data mesh on
            # top would either clash or silently all-gather the batch.
            raise ValueError(
                "model.net.seq_axis (sequence sharding) and "
                "model.inference.num_devices>1 (data-parallel sampling) "
                "are mutually exclusive")
        from ..parallel.mesh import make_mesh
        sampler.mesh = make_mesh(n_dev)
        log.info(f"sampling over mesh {sampler.mesh.shape}")
    profile_dir = cfg.model.inference.get("profile")

    output_dir = Path(str(cfg.model.inference.output_dir))
    all_delta_dir = output_dir / "all_delta"
    all_delta_dir.mkdir(parents=True, exist_ok=True)

    def write_target(code, feats, ensembles, dt_s, avg=False):
        n_conf = sum(v.shape[0] for v in ensembles.values())
        # In packed mode the per-target time is the BUCKET-AVERAGE (targets
        # share device batches, so no exact per-target wall exists); the
        # per-bucket wall is logged separately at the call site.
        how = "bucket-average " if avg else ""
        log.info(f"[{code}] {n_conf} conformations in {how}{dt_s:.1f}s "
                 f"({n_conf / dt_s:.2f} conf/s) at L_pad={feats['aatype'].shape[0]}")
        # Write per-delta PDBs + merged ensemble (unpadded region only).
        # Use the FEATURIZED length, not the raw protein's: strip_ends /
        # truncate_length may have shrunk the sequence, and writing
        # prot.num_residues rows would emit zero-padded garbage residues.
        mask_rows = np.nonzero(np.asarray(feats["residue_mask"]) > 0)[0]
        n_res = int(mask_rows[-1]) + 1 if mask_rows.size else 0
        extra = dict(aatype=feats["aatype"][:n_res],
                     residue_index=feats["residue_index"][:n_res],
                     chain_index=feats["chain_index"][:n_res])
        saved = []
        for delta, atom37 in sorted(ensembles.items()):
            p = output_dir / str(delta) / f"{code}.pdb"
            pdb_io.atom37_to_pdb(atom37[:, :n_res], str(p), **extra)
            saved.append(str(p))
        merged = all_delta_dir / f"{code}.pdb"
        pdb_io.merge_pdbfiles(saved, str(merged))
        log.info(f"[{code}] wrote {merged}")

    # Featurize everything up front so same-bucket targets can share
    # device batches (the reference samples strictly one protein at a
    # time: predict_step asserts batch_size==1, diffusion_module.py:249).
    buckets = cfg.data.get("buckets", (64, 128, 256, 384, 512))
    entries = []
    for i in range(len(ds)):
        prot = ds._load(i)
        feats = featurize_padded(prot, feat_cfg,
                                 bucket=pick_bucket(prot.num_residues, buckets))
        entries.append((ds.accession_code(i), feats))

    params = None
    if entries:
        params = load_params(cfg, net, example_net_batch(entries[0][1]))
        n = sum(np.prod(p.shape) for p in jax.tree.leaves(params))
        log.info(f"params loaded: {n / 1e6:.2f}M "
                 f"({'checkpoint' if cfg.get('ckpt_path') else 'random init'})")

    key = jax.random.PRNGKey(cfg.get("seed", 0) or 0)
    chained = bool(cfg.model.inference.get("chained", False))
    pack = chained and bool(cfg.model.inference.get("pack_targets", True))

    if profile_dir:
        # NOTE: in packed mode this trace spans the ENTIRE multi-bucket run
        # (the unpacked path traces per-target work serially) — profile
        # directories are not comparable across the two modes.
        jax.profiler.start_trace(str(profile_dir))
    if pack:
        # Group targets by padded length; each group is sampled through
        # shared batches (one compiled program per bucket).
        groups: dict = {}
        for i, (code, feats) in enumerate(entries):
            groups.setdefault(feats["aatype"].shape[0], []).append(i)
        for gi, (L_pad, idxs) in enumerate(sorted(groups.items())):
            t0 = time.time()
            ens_list = sampler.sample_ensemble_multi(
                params, jax.random.fold_in(key, 10_000 + gi),
                [entries[i][1] for i in idxs])
            dt_s = time.time() - t0
            log.info(f"bucket L={L_pad}: {len(idxs)} targets in {dt_s:.1f}s")
            for i, ens in zip(idxs, ens_list):
                write_target(entries[i][0], entries[i][1], ens,
                             dt_s / len(idxs), avg=True)
    else:
        for i, (code, feats) in enumerate(entries):
            t0 = time.time()
            if chained:
                # One compiled program for the whole delta grid (the
                # per-delta path compiles one per distinct step count).
                ensembles = sampler.sample_ensemble_chained(
                    params, jax.random.fold_in(key, i), feats)
            else:
                ensembles = sampler.sample_ensemble(
                    params, jax.random.fold_in(key, i), feats,
                    batch_deltas_together=bool(cfg.model.inference.get(
                        "batch_deltas_together", False)))
            write_target(code, feats, ensembles, time.time() - t0)
    if profile_dir:
        jax.profiler.stop_trace()
        log.info(f"profiler trace written to {profile_dir}")
    return str(all_delta_dir)


def main(argv=None):
    name, overrides = parse_cli(argv if argv is not None else sys.argv[1:])
    cfg = load_config(name or "eval", overrides)
    out = run(cfg)
    log.info(f"samples written under {out}")
    return out


if __name__ == "__main__":
    main()
