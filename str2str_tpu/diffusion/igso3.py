"""IGSO(3) (isotropic Gaussian on SO(3)) density, score, and lookup tables.

The IGSO(3) distribution with scale eps has marginal angle density

    f(omega) = (1 - cos omega) / pi * sum_l (2l+1) exp(-l(l+1) eps^2 / 2)
               * sin((l + 1/2) omega) / sin(omega / 2)

(truncated power series; Leach et al. 2022, reparameterized so that
IGSO(3)(eps) is Brownian motion on SO(3) at time t = eps^2 — matches the
reference so3.py:21-130).

Two implementations live here:
  * float64 numpy table builders, cached to an .npz keyed by hyperparameters
    (the reference caches .pt files, so3.py:152-199);
  * jnp on-the-fly series evaluation for in-graph score computation.
"""
from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass
from pathlib import Path
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

DEFAULT_CACHE_DIR = os.environ.get(
    "STR2STR_CACHE_DIR", str(Path.home() / ".cache" / "str2str_tpu"))


def expansion_np(omega: np.ndarray, eps: np.ndarray, n_terms: int = 1000) -> np.ndarray:
    """Truncated series, float64 numpy. omega: (M,), eps: scalar -> (M,)."""
    ls = np.arange(n_terms, dtype=np.float64)[None, :]
    om = np.asarray(omega, dtype=np.float64)[:, None]
    e2 = float(eps) ** 2
    p = (2 * ls + 1) * np.exp(-ls * (ls + 1) * e2 / 2)
    p = p * np.sin(om * (ls + 0.5)) / np.sin(om / 2)
    return p.sum(axis=-1)


def score_norm_np(expansion: np.ndarray, omega: np.ndarray, eps: float,
                  n_terms: int = 1000) -> np.ndarray:
    """d/d omega log [series(omega)] via the quotient rule (float64)."""
    ls = np.arange(n_terms, dtype=np.float64)[None, :]
    om = np.asarray(omega, dtype=np.float64)[:, None]
    e2 = float(eps) ** 2
    hi = np.sin(om * (ls + 0.5))
    dhi = (ls + 0.5) * np.cos(om * (ls + 0.5))
    lo = np.sin(om / 2)
    dlo = 0.5 * np.cos(om / 2)
    dseries = ((2 * ls + 1) * np.exp(-ls * (ls + 1) * e2 / 2)
               * (lo * dhi - hi * dlo) / lo**2).sum(axis=-1)
    return dseries / (expansion + 1e-4)


def expansion_jnp(omega: jnp.ndarray, eps: jnp.ndarray, n_terms: int = 1000) -> jnp.ndarray:
    """Series evaluation in-graph; omega (...,), eps broadcastable to omega."""
    ls = jnp.arange(n_terms, dtype=omega.dtype)
    om = omega[..., None]
    e = jnp.broadcast_to(eps, omega.shape)[..., None]
    p = (2 * ls + 1) * jnp.exp(-ls * (ls + 1) * e**2 / 2)
    p = p * jnp.sin(om * (ls + 0.5)) / jnp.sin(om / 2)
    return p.sum(axis=-1)


def score_norm_jnp(expansion: jnp.ndarray, omega: jnp.ndarray, eps: jnp.ndarray,
                   n_terms: int = 1000) -> jnp.ndarray:
    ls = jnp.arange(n_terms, dtype=omega.dtype)
    om = omega[..., None]
    e = jnp.broadcast_to(eps, omega.shape)[..., None]
    hi = jnp.sin(om * (ls + 0.5))
    dhi = (ls + 0.5) * jnp.cos(om * (ls + 0.5))
    lo = jnp.sin(om / 2)
    dlo = 0.5 * jnp.cos(om / 2)
    dseries = ((2 * ls + 1) * jnp.exp(-ls * (ls + 1) * e**2 / 2)
               * (lo * dhi - hi * dlo) / lo**2).sum(axis=-1)
    return dseries / (expansion + 1e-4)


class IGSO3Tables(NamedTuple):
    """Device-resident lookup tables, indexed by [sigma_idx, omega_idx]."""
    omegas: jnp.ndarray        # (num_omega,)
    sigmas: jnp.ndarray        # (num_sigma,) the discretized sigma schedule
    pdf: jnp.ndarray           # (num_sigma, num_omega) marginal angle pdf
    cdf: jnp.ndarray           # (num_sigma, num_omega)
    score_norms: jnp.ndarray   # (num_sigma, num_omega)
    score_scaling: jnp.ndarray  # (num_sigma,) = sqrt(E[|score|^2]/3)


@dataclass(frozen=True)
class IGSO3Config:
    min_sigma: float = 0.1
    max_sigma: float = 1.5
    num_sigma: int = 1000
    num_omega: int = 1000
    n_terms: int = 1000
    schedule: str = "logarithmic"
    cache_dir: str = DEFAULT_CACHE_DIR

    def cache_key(self) -> str:
        tag = (f"s{self.num_sigma}_o{self.num_omega}_L{self.n_terms}"
               f"_min{self.min_sigma}_max{self.max_sigma}_{self.schedule}")
        return hashlib.sha1(tag.encode()).hexdigest()[:16]


def log_sigma_schedule(t: np.ndarray, min_sigma: float, max_sigma: float):
    """sigma(t) = log(t e^sigma_max + (1-t) e^sigma_min)."""
    xp = jnp if isinstance(t, jnp.ndarray) else np
    return xp.log(t * np.exp(max_sigma) + (1 - t) * np.exp(min_sigma))


def build_tables(cfg: IGSO3Config) -> IGSO3Tables:
    """Build (or load from cache) the pdf/cdf/score tables in float64."""
    cache = Path(cfg.cache_dir) / f"igso3_{cfg.cache_key()}.npz"
    if cache.exists():
        z = np.load(cache)
        arrays = {k: z[k] for k in z.files}
    else:
        omegas = np.linspace(0, np.pi, cfg.num_omega + 1)[1:]
        ts = np.linspace(0.0, 1.0, cfg.num_sigma)
        sigmas = log_sigma_schedule(ts, cfg.min_sigma, cfg.max_sigma)

        pdf = np.empty((cfg.num_sigma, cfg.num_omega))
        score_norms = np.empty_like(pdf)
        for i, sig in enumerate(sigmas):
            exp_vals = expansion_np(omegas, sig, cfg.n_terms)
            pdf[i] = exp_vals * (1.0 - np.cos(omegas)) / np.pi
            score_norms[i] = score_norm_np(exp_vals, omegas, sig, cfg.n_terms)
        cdf = pdf.cumsum(axis=-1) / cfg.num_omega * np.pi
        scaling = np.sqrt(np.abs(
            (score_norms**2 * pdf).sum(-1) / pdf.sum(-1))) / np.sqrt(3.0)

        arrays = dict(omegas=omegas, sigmas=sigmas, pdf=pdf, cdf=cdf,
                      score_norms=score_norms, score_scaling=scaling)
        cache.parent.mkdir(parents=True, exist_ok=True)
        tmp = cache.with_suffix(".tmp.npz")
        np.savez(tmp, **arrays)
        os.replace(tmp, cache)

    return IGSO3Tables(**{k: jnp.asarray(v, dtype=jnp.float32)
                          for k, v in arrays.items()})
