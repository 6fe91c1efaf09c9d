"""Time-lagged Independent Component Analysis (TICA), numpy.

First-party replacement for `deeptime.decomposition.TICA` as used by the
reference metrics (metrics.py:166-194): reversible (symmetrized) covariance
estimation, generalized eigenproblem via C00 whitening, kinetic-map scaling,
dim=2 output. Matches deeptime's documented defaults (bessel correction,
epsilon rank cutoff).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class TICAModel:
    mean: np.ndarray        # (D,)
    projection: np.ndarray  # (D, dim)
    eigenvalues: np.ndarray  # (dim,)

    def transform(self, x: np.ndarray) -> np.ndarray:
        return (np.asarray(x, dtype=np.float64) - self.mean) @ self.projection


def fit_tica(data: np.ndarray, lagtime: int = 20, dim: int = 2,
             epsilon: float = 1e-6, scaling: str = "kinetic_map") -> TICAModel:
    """Fit reversible TICA on a single trajectory (T, D)."""
    x = np.asarray(data, dtype=np.float64)
    if x.shape[0] <= lagtime + 1:
        raise ValueError(f"trajectory length {x.shape[0]} <= lagtime {lagtime}")
    x0, xt = x[:-lagtime], x[lagtime:]
    n = x0.shape[0]

    mean = 0.5 * (x0.mean(0) + xt.mean(0))
    x0c, xtc = x0 - mean, xt - mean
    denom = n - 1  # Bessel correction
    c00 = 0.5 * (x0c.T @ x0c + xtc.T @ xtc) / denom
    c0t = 0.5 * (x0c.T @ xtc + xtc.T @ x0c) / denom

    # Whiten C00 with rank truncation (spd_inv_split equivalent).
    evals, evecs = np.linalg.eigh(c00)
    order = np.argsort(evals)[::-1]
    evals, evecs = evals[order], evecs[:, order]
    keep = evals > epsilon * max(evals.max(), 1e-300)
    w = evecs[:, keep] / np.sqrt(evals[keep])

    k = w.T @ c0t @ w
    k = 0.5 * (k + k.T)
    lam, u = np.linalg.eigh(k)
    order = np.argsort(lam)[::-1]
    lam, u = lam[order][:dim], u[:, order][:, :dim]

    proj = w @ u
    if scaling == "kinetic_map":
        proj = proj * lam[None, :]
    return TICAModel(mean=mean, projection=proj, eigenvalues=lam)
