"""SO(3) rotation diffusion (IGSO(3) forward process + geodesic reverse walk).

Pure-jnp re-design of the reference SO3Diffuser (so3.py:133-371):

  * sampling is a fully vectorized inverse-CDF transform on device
    (`jnp.interp` over per-element CDF rows via vmap) — the reference does a
    per-batch-element `np.interp` Python loop on CPU (so3.py:262-270);
  * rotation composition happens in quaternion space with fp32
    renormalization — the reference round-trips through float64 3x3 matrix
    products (so3.py:13-19), which would be emulated (slow) on TPU;
  * the score can be evaluated from the cached tables (gather) or on the fly
    (truncated series, `igso3.score_norm_jnp`), both in-graph.

All methods treat rotations as (..., 3) axis-angle vectors or (..., 4)
quaternions and broadcast over arbitrary leading batch dims; `t` has the
leading batch shape (B,).
"""
from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import rotations as rot
from . import igso3


@dataclass(frozen=True)
class SO3Config:
    min_sigma: float = 0.1
    max_sigma: float = 1.5
    num_sigma: int = 1000
    num_omega: int = 1000
    n_terms: int = 1000
    schedule: str = "logarithmic"
    use_cached_score: bool = False
    eps: float = 1e-6
    cache_dir: str = igso3.DEFAULT_CACHE_DIR


class SO3Diffusion:
    """Stateless apart from the constant lookup tables (device arrays)."""

    def __init__(self, cfg: SO3Config = SO3Config()):
        if cfg.schedule != "logarithmic":
            raise ValueError(f"unsupported schedule {cfg.schedule}")
        self.cfg = cfg
        self.tables = igso3.build_tables(igso3.IGSO3Config(
            min_sigma=cfg.min_sigma, max_sigma=cfg.max_sigma,
            num_sigma=cfg.num_sigma, num_omega=cfg.num_omega,
            n_terms=cfg.n_terms, schedule=cfg.schedule,
            cache_dir=cfg.cache_dir,
        ))

    # -- schedule ------------------------------------------------------------
    def sigma(self, t: jnp.ndarray) -> jnp.ndarray:
        return igso3.log_sigma_schedule(t, self.cfg.min_sigma, self.cfg.max_sigma)

    def diffusion_coef(self, t: jnp.ndarray) -> jnp.ndarray:
        """g(t) for the log schedule: sigma'(t) = d sigma/dt and
        g^2 = 2 sigma sigma' => g = sqrt(2 (e^max - e^min) sigma / e^sigma)."""
        s = self.sigma(t)
        return jnp.sqrt(
            2 * (np.exp(self.cfg.max_sigma) - np.exp(self.cfg.min_sigma))
            * s / jnp.exp(s))

    def t_to_idx(self, t: jnp.ndarray) -> jnp.ndarray:
        """Index of sigma(t) in the discretized sigma grid."""
        return jnp.clip(
            jnp.searchsorted(self.tables.sigmas, self.sigma(t), side="right") - 1,
            0, self.cfg.num_sigma - 1)

    # -- sampling --------------------------------------------------------------
    def sample(self, key: jax.Array, t: jnp.ndarray, shape: tuple) -> jnp.ndarray:
        """Axis-angle IGSO(3) samples of `shape` (= t.shape + (..., 3)).

        Direction uniform on S^2; angle via inverse-CDF lookup in the table
        row for sigma(t)."""
        assert shape[-1] == 3 and t.shape[0] == shape[0]
        k_dir, k_ang = jax.random.split(key)
        z = jax.random.normal(k_dir, shape)
        axis = z / jnp.linalg.norm(z, axis=-1, keepdims=True)

        u = jax.random.uniform(k_ang, shape[:-1])
        cdf_rows = self.tables.cdf[self.t_to_idx(t)]        # (B, num_omega)
        # Per-batch-row inverse CDF; u rows are (...,) of per-residue uniforms.
        interp = jax.vmap(lambda uu, cc: jnp.interp(uu, cc, self.tables.omegas))
        omega = interp(u.reshape(shape[0], -1), cdf_rows).reshape(shape[:-1])
        return axis * omega[..., None]

    def sample_prior(self, key: jax.Array, shape: tuple) -> jnp.ndarray:
        t = jnp.ones(shape[0], dtype=jnp.float32)
        return self.sample(key, t, shape)

    # -- score -----------------------------------------------------------------
    def _n_terms_eff(self) -> int:
        """Static truncation of the in-graph series.

        Series terms decay as exp(-l(l+1) sigma^2 / 2) and sigma >= min_sigma
        on the whole schedule, so every term past l_max with
        l_max(l_max+1) min_sigma^2/2 >= 40 is below ~1e-17 — orders of
        magnitude under fp32 resolution of the sum. The sampler calls this
        every reverse step on (B, L) rotations; evaluating 1000 terms
        (the table-builder default) in-graph was ~an extra EdgeTransition
        of per-step VPU time at the protocol shape."""
        import math
        n = int(math.ceil(math.sqrt(80.0) / max(self.cfg.min_sigma, 1e-3))) + 2
        return max(16, min(self.cfg.n_terms, n))

    def score(self, vec: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        """Score of IGSO(3) as a tangent (rotation) vector at `vec` (..., 3).

        t: (B,) with B = vec.shape[0]."""
        eps = self.cfg.eps
        # sqrt(.+tiny) keeps the gradient finite at vec == 0 (identity
        # relative rotation; see rotations.quat_to_axis_angle).
        omega = jnp.sqrt(jnp.sum(vec * vec, axis=-1) + 1e-24) + eps
        t_idx = self.t_to_idx(t)
        if self.cfg.use_cached_score:
            norms_t = self.tables.score_norms[t_idx]        # (B, num_omega)
            om_idx = jnp.clip(
                jnp.searchsorted(self.tables.omegas[:-1],
                                 omega.reshape(omega.shape[0], -1), side="right"),
                0, self.cfg.num_omega - 1)
            score_norm = jnp.take_along_axis(norms_t, om_idx, axis=-1)
            score_norm = score_norm.reshape(omega.shape)
        else:
            sigma = self.tables.sigmas[t_idx]
            sigma = sigma.reshape(sigma.shape + (1,) * (omega.ndim - 1))
            n_terms = self._n_terms_eff()
            exp_vals = igso3.expansion_jnp(omega, sigma, n_terms)
            score_norm = igso3.score_norm_jnp(exp_vals, omega, sigma, n_terms)
        return score_norm[..., None] * vec / (omega[..., None] + eps)

    def score_scaling(self, t: jnp.ndarray) -> jnp.ndarray:
        return self.tables.score_scaling[self.t_to_idx(t)]

    # -- forward / reverse -------------------------------------------------------
    def forward_marginal(self, key: jax.Array, rot_0: jnp.ndarray, t: jnp.ndarray):
        """Sample rot_t ~ p(rot_t | rot_0) with its score.

        rot_0: (..., 3) axis-angle. Returns (rot_t, rot_score)."""
        rotvec_0t = self.sample(key, t, rot_0.shape)
        rot_score = self.score(rotvec_0t, t)
        rot_t = rot.compose_axis_angle(rot_0, rotvec_0t)  # right-multiply
        return rot_t, rot_score

    def reverse(self, key: jax.Array, rot_t: jnp.ndarray, score_t: jnp.ndarray,
                t: jnp.ndarray, dt, mask: jnp.ndarray | None = None,
                noise_scale: float = 1.0, probability_flow: bool = True) -> jnp.ndarray:
        """One geodesic random-walk step of the reverse SDE (or prob-flow ODE).

        t broadcasts to rot_t[..., 0]; dt may be a scalar or per-sample array
        broadcastable the same way (per-sample dt powers the batched delta-grid
        sampler)."""
        tb = t.reshape(t.shape + (1,) * (rot_t.ndim - t.ndim))
        dt = jnp.asarray(dt, rot_t.dtype)
        if dt.ndim:
            dt = dt.reshape(dt.shape + (1,) * (rot_t.ndim - dt.ndim))
        g_t = self.diffusion_coef(tb)
        rev_drift = -(g_t**2) * score_t * dt * (0.5 if probability_flow else 1.0)
        if probability_flow:
            perturb = rev_drift
        else:
            z = noise_scale * jax.random.normal(key, score_t.shape, score_t.dtype)
            perturb = rev_drift + g_t * jnp.sqrt(dt) * z
        if mask is not None:
            perturb = perturb * mask[..., None]
        return rot.compose_axis_angle(rot_t, -perturb)

    # -- quaternion-space variants (used by the scan sampler) --------------------
    def forward_marginal_quat(self, key: jax.Array, quat_0: jnp.ndarray, t: jnp.ndarray):
        rotvec_0t = self.sample(key, t, quat_0.shape[:-1] + (3,))
        rot_score = self.score(rotvec_0t, t)
        q_t = rot.quat_multiply(quat_0, rot.axis_angle_to_quat(rotvec_0t))
        q_t = q_t / jnp.linalg.norm(q_t, axis=-1, keepdims=True)
        return q_t, rot_score

    def reverse_quat(self, key: jax.Array, quat_t: jnp.ndarray, score_t: jnp.ndarray,
                     t: jnp.ndarray, dt, mask: jnp.ndarray | None = None,
                     noise_scale: float = 1.0, probability_flow: bool = True) -> jnp.ndarray:
        """Reverse step acting on unit quaternions directly (no matrix
        round-trip; equivalent to `reverse` through axis-angle)."""
        tb = t.reshape(t.shape + (1,) * (quat_t.ndim - t.ndim))
        dt = jnp.asarray(dt, quat_t.dtype)
        if dt.ndim:
            dt = dt.reshape(dt.shape + (1,) * (quat_t.ndim - dt.ndim))
        g_t = self.diffusion_coef(tb)
        rev_drift = -(g_t**2) * score_t * dt * (0.5 if probability_flow else 1.0)
        if probability_flow:
            perturb = rev_drift
        else:
            z = noise_scale * jax.random.normal(key, score_t.shape, score_t.dtype)
            perturb = rev_drift + g_t * jnp.sqrt(dt) * z
        if mask is not None:
            perturb = perturb * mask[..., None]
        q = rot.quat_multiply(quat_t, rot.axis_angle_to_quat(-perturb))
        return q / jnp.linalg.norm(q, axis=-1, keepdims=True)
