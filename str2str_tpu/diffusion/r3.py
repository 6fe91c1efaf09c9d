"""R^3 translation diffusion: variance-preserving SDE with linear beta(t).

Closed-form Gaussian marginals; everything is trivially jittable. Matches the
reference R3Diffuser (r3.py:8-147): beta(t) in [min_b, max_b], coordinate
scaling (default 0.1 = Angstrom -> nm), Euler–Maruyama / probability-flow
reverse step with mask-aware center-of-mass removal.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


def _bcast_t(t: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Broadcast a (B,)-shaped t against x's leading dims."""
    return t.reshape(t.shape + (1,) * (x.ndim - t.ndim))


@dataclass(frozen=True)
class R3Config:
    min_b: float = 0.1
    max_b: float = 20.0
    coordinate_scaling: float = 1.0


class R3Diffusion:
    def __init__(self, cfg: R3Config = R3Config()):
        self.cfg = cfg

    def scale(self, x):
        return x * self.cfg.coordinate_scaling

    def unscale(self, x):
        return x / self.cfg.coordinate_scaling

    def b_t(self, t):
        return self.cfg.min_b + t * (self.cfg.max_b - self.cfg.min_b)

    def marginal_b_t(self, t):
        return t * self.cfg.min_b + 0.5 * t**2 * (self.cfg.max_b - self.cfg.min_b)

    def diffusion_coef(self, t):
        return jnp.sqrt(self.b_t(t))

    def drift_coef(self, x, t):
        return -0.5 * self.b_t(t) * x

    def conditional_var(self, t):
        return 1.0 - jnp.exp(-self.marginal_b_t(t))

    def score_scaling(self, t):
        return 1.0 / jnp.sqrt(self.conditional_var(t))

    def score(self, x_t, x_0, t, scale: bool = False):
        """Exact Gaussian score of p(x_t | x_0), in scaled coordinates."""
        t = _bcast_t(t, x_t)
        if scale:
            x_t, x_0 = self.scale(x_t), self.scale(x_0)
        return -(x_t - jnp.exp(-0.5 * self.marginal_b_t(t)) * x_0) / self.conditional_var(t)

    def sample_prior(self, key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype)

    def forward_marginal(self, key, x_0: jnp.ndarray, t: jnp.ndarray):
        """x_0 (..., N, 3) in Angstroms, t (B,). Returns (x_t [Angstroms],
        score_t [scaled coords])."""
        tb = _bcast_t(t, x_0)
        x0s = self.scale(x_0)
        loc = jnp.exp(-0.5 * self.marginal_b_t(tb)) * x0s
        std = jnp.sqrt(1.0 - jnp.exp(-self.marginal_b_t(tb)))
        z = jax.random.normal(key, x_0.shape, x_0.dtype)
        x_t = z * std + loc
        score_t = self.score(x_t, x0s, t)
        return self.unscale(x_t), score_t

    def reverse(self, key, x_t: jnp.ndarray, score_t: jnp.ndarray, t: jnp.ndarray,
                dt, mask: jnp.ndarray | None = None, center: bool = True,
                center_mask: jnp.ndarray | None = None,
                noise_scale: float = 1.0, probability_flow: bool = True) -> jnp.ndarray:
        """One reverse Euler–Maruyama (or probability-flow ODE) step.

        mask gates which residues move; center_mask defines the center-of-mass
        population (defaults to all residues, which is the reference behavior
        on its unpadded batch-of-1 inference; pass the residue mask when
        positions are padded). dt may be scalar or per-sample broadcastable.
        """
        tb = _bcast_t(t, x_t)
        dt = jnp.asarray(dt, x_t.dtype)
        if dt.ndim:
            dt = _bcast_t(dt, x_t)
        x_t = self.scale(x_t)
        f_t = self.drift_coef(x_t, tb)
        g_t = self.diffusion_coef(tb)
        rev_drift = (f_t - g_t**2 * score_t) * dt * (0.5 if probability_flow else 1.0)
        if probability_flow:
            perturb = rev_drift
        else:
            z = noise_scale * jax.random.normal(key, x_t.shape, x_t.dtype)
            perturb = rev_drift + g_t * jnp.sqrt(dt) * z
        if mask is not None:
            perturb = perturb * mask[..., None]
        x = x_t - perturb
        if center:
            cm = jnp.ones_like(x[..., 0]) if center_mask is None else center_mask
            com = jnp.sum(x * cm[..., None], axis=-2, keepdims=True) / (
                jnp.sum(cm, axis=-1)[..., None, None])
            x = x - com
        return self.unscale(x)
