"""Ensemble quality metrics (numpy, host-side).

Exact-semantics rebuild of the reference metric suite
(`/root/reference/src/metrics/metrics.py`): steric-clash validity, CA-CA
bonding validity, and Jensen–Shannon divergences over pairwise distances,
TICA projections, and radius of gyration — including the reference's binning
protocol (50 bins over the *reference ensemble's* per-channel range, 1e-6
pseudo-counts, triu offsets). Kept in numpy so numbers are bit-comparable
with the reference pipeline.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np
from scipy.spatial import distance as _sdist

from .tica import fit_tica

EPS = 1e-12
PSEUDO_C = 1e-6


def adjacent_ca_distance(coords: np.ndarray) -> np.ndarray:
    """(..., L, 3) -> (..., L-1) consecutive-CA distances."""
    d = coords[..., :-1, :] - coords[..., 1:, :]
    return np.sqrt((d ** 2).sum(-1))


def distance_matrix_ca(coords: np.ndarray) -> np.ndarray:
    d = coords[..., None, :, :] - coords[..., :, None, :]
    return np.sqrt((d ** 2).sum(-1))


def pairwise_distance_ca(coords: np.ndarray, k: int = 1) -> np.ndarray:
    """Upper-triangle (offset k) pairwise CA distances: (..., D)."""
    dist = distance_matrix_ca(coords)
    row, col = np.triu_indices(dist.shape[-1], k=k)
    return dist[..., row, col]


def radius_of_gyration(coords: np.ndarray, masses: Optional[np.ndarray] = None) -> np.ndarray:
    if masses is None:
        weights = np.full(coords.shape[-2], 1.0 / coords.shape[-2])
    else:
        weights = masses / masses.sum()
    centered = coords - coords.mean(-2, keepdims=True)
    return np.sqrt(((centered ** 2).sum(-1) * weights).sum(-1))


def steric_clash_counts(coords: np.ndarray, ca_vdw_radius: float = 1.7,
                        allowable_overlap: float = 0.4,
                        k_exclusion: int = 0) -> np.ndarray:
    """Number of CA-CA clashes per conformation (reference metrics.py:80)."""
    bar = 2 * ca_vdw_radius - allowable_overlap
    pwd = pairwise_distance_ca(coords, k=k_exclusion + 1)
    return (pwd < bar).sum(-1).astype(int)


def validity(ca_coords_dict: Dict[str, np.ndarray], **clash_kwargs) -> Dict[str, float]:
    """Fraction of clash-free conformations per ensemble."""
    return {
        k: float(np.around(1.0 - (steric_clash_counts(v, **clash_kwargs) > 0).mean(), 4))
        for k, v in ca_coords_dict.items()
    }


def bonding_validity(ca_coords_dict: Dict[str, np.ndarray],
                     ref_key: str = "target") -> Dict[str, float]:
    """Fraction of conformations whose max adjacent-CA distance stays below
    the reference ensemble's max (reference metrics.py:124)."""
    adj = {k: adjacent_ca_distance(v) for k, v in ca_coords_dict.items()}
    thres = adj[ref_key].max() + 1e-6
    return {
        k: float(np.around((v < thres).all(-1).sum() / len(v), 4))
        for k, v in adj.items()
    }


def _binned_js(values: Dict[str, np.ndarray], ref_key: str, n_bins: int) -> Dict[str, float]:
    """Per-channel histograms over the reference range, then mean JS distance.

    values: {k: (B, D)} (D = feature channels; D may be 1)."""
    ref = values[ref_key]
    d_min, d_max = ref.min(axis=0), ref.max(axis=0)

    def hist(v):
        # (B, D) -> (n_bins, D) histogram per channel over [d_min, d_max].
        out = np.empty((n_bins, v.shape[1]))
        for j in range(v.shape[1]):
            out[:, j] = np.histogram(v[:, j], bins=n_bins,
                                     range=(d_min[j], d_max[j]))[0]
        return out + PSEUDO_C

    binned = {k: hist(np.atleast_2d(v)) for k, v in values.items()}
    results = {
        k: float(np.around(_sdist.jensenshannon(v, binned[ref_key], axis=0).mean(), 4))
        for k, v in binned.items() if k != ref_key
    }
    results[ref_key] = 0.0
    return results


def js_pwd(ca_coords_dict: Dict[str, np.ndarray], ref_key: str = "target",
           n_bins: int = 50, pwd_offset: int = 3) -> Dict[str, float]:
    pwd = {k: pairwise_distance_ca(v, k=pwd_offset) for k, v in ca_coords_dict.items()}
    return _binned_js(pwd, ref_key, n_bins)


def js_rg(ca_coords_dict: Dict[str, np.ndarray], ref_key: str = "target",
          n_bins: int = 50) -> Dict[str, float]:
    rg = {k: radius_of_gyration(v)[:, None] for k, v in ca_coords_dict.items()}
    return _binned_js(rg, ref_key, n_bins)


def js_tica(ca_coords_dict: Dict[str, np.ndarray], ref_key: str = "target",
            n_bins: int = 50, lagtime: int = 20, return_tic: bool = True):
    """Fit TICA (dim=2) on the reference ensemble's pairwise distances, project
    all ensembles, then binned JS per TIC (reference metrics.py:166)."""
    pwd = {k: pairwise_distance_ca(v) for k, v in ca_coords_dict.items()}
    model = fit_tica(pwd[ref_key], lagtime=lagtime, dim=2)
    dr2d = {k: model.transform(v) for k, v in pwd.items()}
    results = _binned_js(dr2d, ref_key, n_bins)
    if return_tic:
        return results, dr2d
    return results


def evaluate_ensembles(ca_coords_dict: Dict[str, np.ndarray],
                       ref_key: str = "target") -> Dict[str, Dict[str, float]]:
    """The reference's full metric row (eval.py:64-91)."""
    tic_js, tics = js_tica(ca_coords_dict, ref_key=ref_key, return_tic=True)
    return {
        "val_clash": validity(ca_coords_dict),
        "val_bond": bonding_validity(ca_coords_dict, ref_key=ref_key),
        "js_pwd": js_pwd(ca_coords_dict, ref_key=ref_key),
        "js_tica": tic_js,
        "js_rg": js_rg(ca_coords_dict, ref_key=ref_key),
        "_tics": tics,
    }
