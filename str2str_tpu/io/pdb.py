"""PDB ensemble utilities: multi-model files, merge/split, backbone coords.

First-party equivalents of the reference's pdb_utils
(`/root/reference/src/common/pdb_utils.py:31-352`): write an atom37 ensemble
as a multi-MODEL PDB, merge/split multi-model files, stratified subsampling,
and CA/backbone coordinate extraction for the metrics pipeline.
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..geometry import chemical as ch
from . import protein as prot_io

BACKBONE_ATOMS = ("N", "CA", "C")


def atom37_to_pdb(atom_positions: np.ndarray, save_to: str,
                  aatype: Optional[np.ndarray] = None,
                  residue_index: Optional[np.ndarray] = None,
                  chain_index: Optional[np.ndarray] = None,
                  b_factors: Optional[np.ndarray] = None,
                  atom_mask: Optional[np.ndarray] = None) -> str:
    """Write a (B, L, 37, 3) ensemble (or single (L, 37, 3) structure) as a
    multi-MODEL PDB (reference pdb_utils.py:205)."""
    pos = np.asarray(atom_positions)
    if pos.ndim == 3:
        pos = pos[None]
    B, L = pos.shape[:2]
    if aatype is None:
        aatype = np.zeros((L,), dtype=np.int32)  # poly-ALA fallback
    if residue_index is None:
        residue_index = np.arange(1, L + 1, dtype=np.int32)
    if chain_index is None:
        chain_index = np.zeros((L,), dtype=np.int32)

    models = []
    for b in range(B):
        mask = (atom_mask if atom_mask is not None
                else np.any(pos[b] != 0.0, axis=-1).astype(np.float32))
        models.append(prot_io.Protein(
            atom_positions=pos[b].astype(np.float32),
            atom_mask=np.asarray(mask, dtype=np.float32),
            aatype=np.asarray(aatype, dtype=np.int32),
            residue_index=np.asarray(residue_index, dtype=np.int32),
            chain_index=np.asarray(chain_index, dtype=np.int32),
            b_factors=(np.asarray(b_factors, dtype=np.float32)
                       if b_factors is not None
                       else np.zeros((L, ch.atom_type_num), np.float32)),
        ))
    Path(save_to).parent.mkdir(parents=True, exist_ok=True)

    # Native fast path for large ensembles with a shared mask (the common
    # sampler/trajectory case); the Python writer handles the rest.
    from . import native
    text = None
    if atom_mask is not None and B > 1:
        text = native.write_pdb_ensemble(
            pos, models[0].atom_mask, models[0].aatype,
            models[0].residue_index, models[0].chain_index,
            models[0].b_factors) if native.is_available() else None
    if text is None:
        text = prot_io.to_pdb(models)
    Path(save_to).write_text(text)
    return str(save_to)


def merge_pdbfiles(inputs: Sequence[str], save_to: str) -> str:
    """Concatenate the models of several PDB files into one multi-MODEL file
    (reference pdb_utils.py:31)."""
    models: List[prot_io.Protein] = []
    for path in inputs:
        models.extend(prot_io.parse_pdb_models(Path(path).read_text()))
    Path(save_to).parent.mkdir(parents=True, exist_ok=True)
    Path(save_to).write_text(prot_io.to_pdb(models))
    return str(save_to)


def split_pdbfile(path: str, out_dir: str) -> List[str]:
    """Split a multi-MODEL PDB into per-model files (reference pdb_utils.py:86)."""
    models = prot_io.parse_pdb_models(Path(path).read_text())
    stem = Path(path).stem
    out = []
    Path(out_dir).mkdir(parents=True, exist_ok=True)
    for i, m in enumerate(models):
        p = Path(out_dir) / f"{stem}_{i}.pdb"
        p.write_text(prot_io.to_pdb(m))
        out.append(str(p))
    return out


def stratify_sample_pdbfile(path: str, save_to: str, n_samples: int,
                            seed: int = 0) -> str:
    """Evenly-stratified subsample of a multi-model ensemble
    (reference pdb_utils.py:125)."""
    models = prot_io.parse_pdb_models(Path(path).read_text())
    if len(models) <= n_samples:
        picked = models
    else:
        rng = np.random.RandomState(seed)
        edges = np.linspace(0, len(models), n_samples + 1).astype(int)
        picked = [models[rng.randint(lo, max(lo + 1, hi))]
                  for lo, hi in zip(edges[:-1], edges[1:])]
    Path(save_to).parent.mkdir(parents=True, exist_ok=True)
    Path(save_to).write_text(prot_io.to_pdb(picked))
    return str(save_to)


def extract_backbone_coords(path: str, atoms: Sequence[str] = ("CA",),
                            max_models: Optional[int] = None) -> np.ndarray:
    """(B, L*len(atoms), 3) backbone coordinates from a multi-model PDB
    (reference pdb_utils.py:255-317). Residues missing any requested atom in
    the FIRST model define the common mask applied to every model.

    Uses the native C++ ensemble parser when available (MD reference
    trajectories run to thousands of models); falls back to the Python
    parser otherwise."""
    idx = [ch.atom_order[a] for a in atoms]
    text = Path(path).read_text()

    from . import native
    ens = native.parse_pdb_ensemble(text, max_models=max_models) \
        if native.is_available() else None
    if ens is not None:
        keep = np.all(ens["mask"][0][:, idx] > 0.5, axis=-1)
        sel = ens["positions"][:, keep][:, :, idx, :]  # (M, L', n_atoms, 3)
        return sel.reshape(sel.shape[0], -1, 3)

    models = prot_io.parse_pdb_models(text, max_models=max_models)
    # Same contract as the native path (which refuses inconsistent models):
    # every model must carry the same residues as model 0, else the model-0
    # mask would silently mis-select coordinates.
    for mi, m in enumerate(models[1:], start=1):
        if (m.num_residues != models[0].num_residues
                or not np.array_equal(m.residue_index,
                                      models[0].residue_index)):
            raise ValueError(
                f"inconsistent multi-model PDB {path!r}: model {mi} has "
                f"different residues than model 0")
    keep = np.all(models[0].atom_mask[:, idx] > 0.5, axis=-1)
    coords = []
    for m in models:
        sel = m.atom_positions[keep][:, idx, :]  # (L', n_atoms, 3)
        coords.append(sel.reshape(-1, 3))
    return np.stack(coords, axis=0)


def load_ensembles_ca(pred_path: str, target_path: str) -> Dict[str, np.ndarray]:
    """CA ensembles for metric evaluation, with matching residue counts."""
    pred = extract_backbone_coords(pred_path, atoms=("CA",))
    target = extract_backbone_coords(target_path, atoms=("CA",))
    if pred.shape[1] != target.shape[1]:
        n = min(pred.shape[1], target.shape[1])
        pred, target = pred[:, :n], target[:, :n]
    return {"sample": pred, "target": target}
