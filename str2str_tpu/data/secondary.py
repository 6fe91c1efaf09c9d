"""Secondary-structure assignment and radius of gyration, first-party.

The reference computes per-chain DSSP secondary-structure percentages and
radius of gyration for the preprocessing metadata CSV via mdtraj/DSSP
(`/root/reference/scripts/pdb/preprocess.py:200-227`). Neither mdtraj nor a
dssp binary ships in this image, so this module implements:

  * `assign_secondary_structure`: 3-state (H/E/C) assignment from backbone
    coordinates using the Kabsch–Sander hydrogen-bond energy
    (E = 0.084*332*(1/r_ON + 1/r_CH - 1/r_OH - 1/r_CN) kcal/mol, bond when
    E < -0.5), amide H rebuilt from the previous peptide plane — the same
    physics DSSP's simplified ('H','E','C') output reduces to.
  * `radius_of_gyration`: mass-weighted Rg over resolved heavy atoms
    (mdtraj.compute_rg semantics, element masses by atom-name initial).
"""
from __future__ import annotations

import numpy as np

from ..geometry import chemical as ch

_MASS = {"N": 14.007, "C": 12.011, "O": 15.999, "S": 32.06}
_Q1Q2_F = 0.084 * 332.0  # Kabsch-Sander coupling constant (kcal/mol * A)
_HBOND_E = -0.5


def _kabsch_sander_hbonds(n: np.ndarray, ca: np.ndarray, c: np.ndarray,
                          o: np.ndarray, bb_mask: np.ndarray) -> np.ndarray:
    """(L, L) boolean: residue i's N-H donates an H-bond to residue j's C=O."""
    L = n.shape[0]
    # Rebuild amide H from the previous peptide plane: H_i lies 1.01 A from
    # N_i opposite the previous carbonyl O->C direction. Residue 0 (and any
    # residue after a gap) has no H -> cannot donate.
    co = c[:-1] - o[:-1]
    co /= np.linalg.norm(co, axis=-1, keepdims=True) + 1e-8
    h = np.zeros_like(n)
    h[1:] = n[1:] + 1.01 * co
    has_h = np.zeros(L, bool)
    has_h[1:] = bb_mask[1:] & bb_mask[:-1]

    def dist(a, b):
        return np.linalg.norm(a[:, None, :] - b[None, :, :], axis=-1) + 1e-8

    # donor i (N-H), acceptor j (C=O)
    energy = _Q1Q2_F * (1.0 / dist(n, o) + 1.0 / dist(h, c)
                        - 1.0 / dist(h, o) - 1.0 / dist(n, c))
    valid = (has_h[:, None] & bb_mask[None, :]
             & (np.abs(np.arange(L)[:, None] - np.arange(L)[None, :]) > 1))
    return (energy < _HBOND_E) & valid


def assign_secondary_structure(atom37: np.ndarray,
                               atom_mask: np.ndarray) -> np.ndarray:
    """3-state secondary structure per residue: 'H' (alpha helix), 'E'
    (beta strand), 'C' (coil). atom37 (L, 37, 3), atom_mask (L, 37)."""
    L = atom37.shape[0]
    ss = np.full(L, "C", dtype="U1")
    if L < 5:
        return ss
    idx = [ch.atom_order[a] for a in ("N", "CA", "C", "O")]
    bb_mask = atom_mask[:, idx].all(axis=-1).astype(bool)
    if bb_mask.sum() < 5:
        return ss
    n, ca, c, o = (atom37[:, j] for j in idx)
    hb = _kabsch_sander_hbonds(n, ca, c, o, bb_mask)

    # Helix: 4-turn at i means HBond(N of i+4 -> O of i). Residue i..i+3 are
    # helical when consecutive turns start at i-1 and i (DSSP's minimal
    # two-turn criterion, simplified to the 'H' class).
    turn4 = np.zeros(L, bool)
    turn4[: L - 4] = hb[np.arange(4, L), np.arange(L - 4)]
    for i in range(1, L - 4):
        if turn4[i - 1] and turn4[i]:
            ss[i:i + 4] = "H"

    # Strand: Kabsch-Sander bridges between residues far apart in sequence.
    # parallel:    HBond(i-1 <- j) and HBond(j <- i+1)
    # antiparallel: HBond(i <- j) and HBond(j <- i)
    far = np.abs(np.arange(L)[:, None] - np.arange(L)[None, :]) >= 3
    anti = hb & hb.T & far
    # parallel, DSSP form 1: HBond(CO i-1 <- NH j) and HBond(CO j <- NH i+1),
    # i.e. hb[j, i-1] and hb[i+1, j]. Form 2 — HBond(CO j-1 <- NH i) and
    # HBond(CO i <- NH j+1) — is form 1 with (i, j) swapped, so the
    # transpose marks the partner residue of every parallel bridge.
    par = np.zeros_like(anti)
    for i in range(1, L - 1):
        par[i] = hb[:, i - 1] & hb[i + 1, :] & far[i]
    bridge = (anti | par | par.T).any(axis=1)
    ss[bridge & (ss != "H")] = "E"
    return ss


def secondary_structure_percents(atom37: np.ndarray,
                                 atom_mask: np.ndarray) -> dict:
    ss = assign_secondary_structure(atom37, atom_mask)
    L = max(len(ss), 1)
    return {
        "helix_percent": float((ss == "H").sum()) / L,
        "strand_percent": float((ss == "E").sum()) / L,
        "coil_percent": float((ss == "C").sum()) / L,
    }


def radius_of_gyration(atom37: np.ndarray, atom_mask: np.ndarray,
                       nanometers: bool = True) -> float:
    """Mass-weighted Rg over resolved heavy atoms (mdtraj.compute_rg
    semantics; mdtraj reports nanometers)."""
    masses = np.asarray([_MASS.get(a[0], 12.011) for a in ch.atom_types],
                        np.float64)
    w = atom_mask.astype(np.float64) * masses[None, :]
    wsum = w.sum()
    if wsum <= 0:
        return float("nan")
    pos = atom37.reshape(-1, 3).astype(np.float64)
    wf = w.reshape(-1)
    com = (pos * wf[:, None]).sum(0) / wsum
    rg2 = (wf * ((pos - com) ** 2).sum(-1)).sum() / wsum
    rg = np.sqrt(rg2)
    return float(rg / 10.0) if nanometers else float(rg)
