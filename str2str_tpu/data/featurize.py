"""Protein -> model features (numpy host pipeline + jnp geometry).

Capability parity with the reference ProteinFeatureTransform
(`/root/reference/src/data/components/dataset.py:26-143`): mask patching,
terminal-gap stripping, optional random truncation, CA-center-of-mass
recentering, and the AF2 transform chain (frames, torsions, atom14,
pseudo-beta). Adds fixed-shape padding ("length bucketing") so batches have
static shapes for XLA.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import numpy as np

from ..geometry import chemical as ch
from ..geometry import frames as F
from ..io.protein import Protein

# Keys produced per example (before padding); everything is numpy.
PAD_ZERO_KEYS = (
    "atom_positions", "atom_mask", "seq_mask", "residue_mask", "fixed_mask",
    "sc_ca_t", "residue_idx", "aatype", "residue_index", "chain_index",
    "rigidgroups_gt_frames", "rigidgroups_gt_exists", "torsion_angles_sin_cos",
    "alt_torsion_angles_sin_cos", "torsion_angles_mask", "pseudo_beta",
    "pseudo_beta_mask", "atom14_gt_positions", "atom14_gt_exists",
    "atom14_atom_exists", "residx_atom14_to_atom37",
)

BUCKETS = (64, 128, 256, 384, 512)


def pick_bucket(n: int, buckets=BUCKETS) -> int:
    for b in buckets:
        if n <= b:
            return b
    return int(np.ceil(n / 128) * 128)


@dataclass(frozen=True)
class FeaturizeConfig:
    strip_missing_residues: bool = True
    recenter_and_scale: bool = True
    truncate_length: Optional[int] = None
    coordinate_scale: float = 1.0  # angstrom units
    eps: float = 1e-8


def featurize(prot: Protein, cfg: FeaturizeConfig = FeaturizeConfig(),
              rng: Optional[np.random.RandomState] = None) -> Dict[str, np.ndarray]:
    aatype = np.asarray(prot.aatype, dtype=np.int32)
    pos = np.asarray(prot.atom_positions, dtype=np.float32)
    mask = np.asarray(prot.atom_mask, dtype=np.float32)
    residue_index = np.asarray(prot.residue_index, dtype=np.int32)
    chain_index = np.asarray(prot.chain_index, dtype=np.int32)

    if cfg.strip_missing_residues:
        modeled = np.where(aatype != ch.unk_restype_index)[0]
        if modeled.size:
            lo, hi = modeled.min(), modeled.max() + 1
            aatype, pos, mask = aatype[lo:hi], pos[lo:hi], mask[lo:hi]
            residue_index, chain_index = residue_index[lo:hi], chain_index[lo:hi]

    if cfg.truncate_length is not None and aatype.shape[0] > cfg.truncate_length:
        rng = rng or np.random.RandomState()
        start = rng.randint(0, aatype.shape[0] - cfg.truncate_length + 1)
        sl = slice(start, start + cfg.truncate_length)
        aatype, pos, mask = aatype[sl], pos[sl], mask[sl]
        residue_index, chain_index = residue_index[sl], chain_index[sl]

    seq_mask = mask[:, ch.CA_IDX]
    if cfg.recenter_and_scale:
        center = pos[:, ch.CA_IDX].sum(0) / (seq_mask.sum() + cfg.eps)
        pos = (pos - center[None, None]) * cfg.coordinate_scale
        pos = pos * mask[..., None]

    residue_idx = residue_index - residue_index.min()

    feats: Dict[str, np.ndarray] = {
        "aatype": aatype,
        "atom_positions": pos,
        "atom_mask": mask,
        "residue_index": residue_index,
        "chain_index": chain_index,
        "residue_idx": residue_idx.astype(np.int32),
        "seq_mask": seq_mask,
        "residue_mask": seq_mask.copy(),
        "fixed_mask": np.zeros_like(seq_mask),
        "sc_ca_t": np.zeros(seq_mask.shape + (3,), dtype=np.float32),
    }

    # AF2 geometry features (jnp ops; converted back to numpy). Pinned to
    # the host CPU device: featurization runs inside the data path
    # (BucketedLoader prefetch threads), and dispatching these tiny
    # per-example ops onto the accelerator would interleave them with
    # training/sampling work on the device stream.
    import contextlib
    import jax
    import jax.numpy as jnp

    try:
        cpu_ctx = jax.default_device(jax.devices("cpu")[0])
    except RuntimeError:  # pragma: no cover - host CPU backend absent
        cpu_ctx = contextlib.nullcontext()
    with cpu_ctx:
        a, p, m = jnp.asarray(aatype), jnp.asarray(pos), jnp.asarray(mask)
        frames = F.atom37_to_frames(a, p, m)
        torsions = F.atom37_to_torsion_angles(a, p, m)
        atom14 = F.make_atom14_positions(a, p, m)
        pb, pb_mask = F.pseudo_beta(a, p, m)
        for d in (frames, torsions, atom14):
            feats.update({k: np.asarray(v) for k, v in d.items()})
        feats["pseudo_beta"] = np.asarray(pb)
        feats["pseudo_beta_mask"] = np.asarray(pb_mask)
    return feats


def pad_features(feats: Dict[str, np.ndarray], target_len: int) -> Dict[str, np.ndarray]:
    """Right-pad every residue-indexed array to `target_len` with zeros."""
    n = feats["aatype"].shape[0]
    if n > target_len:
        raise ValueError(f"protein length {n} exceeds bucket {target_len}")
    out = {}
    for k, v in feats.items():
        if isinstance(v, np.ndarray) and v.ndim >= 1 and v.shape[0] == n:
            pad = [(0, target_len - n)] + [(0, 0)] * (v.ndim - 1)
            out[k] = np.pad(v, pad)
        else:
            out[k] = v
    return out


def featurize_padded(prot: Protein, cfg: FeaturizeConfig = FeaturizeConfig(),
                     bucket: Optional[int] = None,
                     rng: Optional[np.random.RandomState] = None) -> Dict[str, np.ndarray]:
    feats = featurize(prot, cfg, rng)
    n = feats["aatype"].shape[0]
    return pad_features(feats, bucket or pick_bucket(n))
