"""Rigid alignment (Kabsch) and RMSD, in jnp.

Capability parity with the reference's alignment helpers
(`/root/reference/src/common/geo_utils.py:58-143`): optimal rigid
superposition via SVD with reflection correction, aligned RMSD / squared
deviation.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def kabsch_align(mobile: jnp.ndarray, target: jnp.ndarray):
    """Optimal rotation/translation mapping `mobile` onto `target`.

    mobile/target: (..., N, 3). Returns (rot (..., 3, 3), trans (..., 3))
    such that mobile @ rot.T + trans best fits target."""
    mu_m = mobile.mean(axis=-2, keepdims=True)
    mu_t = target.mean(axis=-2, keepdims=True)
    a = mobile - mu_m
    b = target - mu_t
    h = jnp.einsum("...ni,...nj->...ij", a, b, precision=lax.Precision.HIGHEST)
    u, s, vt = jnp.linalg.svd(h, full_matrices=False)
    # Reflection correction: enforce det(R) = +1.
    det = jnp.linalg.det(jnp.einsum("...ij,...jk->...ik",
                                    jnp.swapaxes(vt, -1, -2),
                                    jnp.swapaxes(u, -1, -2)))
    flip = jnp.concatenate(
        [jnp.ones(det.shape + (2,)), jnp.sign(det)[..., None]], axis=-1)
    rot = jnp.einsum("...ji,...j,...jk->...ik", vt, flip, jnp.swapaxes(u, -1, -2))
    trans = (mu_t - jnp.einsum("...ni,...ji->...nj", mu_m, rot))[..., 0, :]
    return rot, trans


def align(mobile: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    rot, trans = kabsch_align(mobile, target)
    return jnp.einsum("...ni,...ji->...nj", mobile, rot) + trans[..., None, :]


def rmsd(xyz1: jnp.ndarray, xyz2: jnp.ndarray, superimpose: bool = True) -> jnp.ndarray:
    """Root-mean-square deviation, optionally after optimal superposition.
    xyz: (..., N, 3); returns (...)."""
    if superimpose:
        xyz1 = align(xyz1, xyz2)
    return jnp.sqrt(jnp.mean(jnp.sum((xyz1 - xyz2) ** 2, axis=-1), axis=-1))
