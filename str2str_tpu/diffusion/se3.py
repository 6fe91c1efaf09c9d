"""SE(3) frame diffusion: SO(3) rotations x R^3 translations.

Capability parity with the reference FrameDiffuser (frame.py:21-255), with
one structural change: the sampler state is carried as (quat, trans) arrays —
a natural pytree for `lax.scan` — rather than Rigid objects that are
decomposed to axis-angle and reassembled from matrices every step. Either
component diffusion may be disabled (None), freezing that component.

All randomness is explicit via jax PRNG keys.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..geometry import rotations as rot
from ..geometry.rigid import Rigid
from .r3 import R3Diffusion
from .so3 import SO3Diffusion


class FrameState(NamedTuple):
    """Sampler/diffusion state: unit quaternions + translations (Angstroms)."""
    quat: jnp.ndarray   # (..., 4)
    trans: jnp.ndarray  # (..., 3)

    @staticmethod
    def from_rigid(r: Rigid) -> "FrameState":
        return FrameState(r.quats(), r.trans)

    @staticmethod
    def from_tensor_7(t7: jnp.ndarray) -> "FrameState":
        q = t7[..., :4]
        q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
        return FrameState(q, t7[..., 4:])

    def to_rigid(self) -> Rigid:
        return Rigid.from_quat_trans(self.quat, self.trans)

    def to_tensor_7(self) -> jnp.ndarray:
        return jnp.concatenate([self.quat, self.trans], axis=-1)


def _apply_mask(x_new, x_old, mask):
    return mask * x_new + (1.0 - mask) * x_old


class SE3Diffusion:
    def __init__(self,
                 trans: Optional[R3Diffusion] = None,
                 rotation: Optional[SO3Diffusion] = None,
                 min_t: float = 1e-2):
        self.trans = trans
        self.rotation = rotation
        self.min_t = min_t

    # -- forward --------------------------------------------------------------
    def forward_marginal(self, key: jax.Array, state_0: FrameState, t: jnp.ndarray,
                         diffuse_mask: jnp.ndarray | None = None) -> dict:
        """Perturb frames to time t. t: (B,) matching state_0 leading dim.

        Returns dict with state_t (FrameState), rot/trans scores and their
        normalization scalings (reference frame.py:36-107)."""
        k_rot, k_trans = jax.random.split(key)

        if self.rotation is None:
            quat_t = state_0.quat
            rot_score = jnp.zeros(state_0.quat.shape[:-1] + (3,), state_0.quat.dtype)
            rot_score_scaling = t
        else:
            quat_t, rot_score = self.rotation.forward_marginal_quat(
                k_rot, state_0.quat, t)
            rot_score_scaling = self.rotation.score_scaling(t)

        if self.trans is None:
            trans_t = state_0.trans
            trans_score = jnp.zeros_like(state_0.trans)
            trans_score_scaling = jnp.ones_like(t)
        else:
            trans_t, trans_score = self.trans.forward_marginal(
                k_trans, state_0.trans, t)
            trans_score_scaling = self.trans.score_scaling(t)

        if diffuse_mask is not None:
            m = diffuse_mask[..., None].astype(trans_t.dtype)
            # Slerp-free masking: quaternions swap wholesale per residue.
            quat_t = jnp.where(m > 0, quat_t, state_0.quat)
            trans_t = _apply_mask(trans_t, state_0.trans, m)
            trans_score = trans_score * m
            rot_score = rot_score * m

        return {
            "state_t": FrameState(quat_t, trans_t),
            "rigids_t": jnp.concatenate([quat_t, trans_t], axis=-1),
            "trans_score": trans_score,
            "rot_score": rot_score,
            "trans_score_scaling": trans_score_scaling,
            "rot_score_scaling": rot_score_scaling,
        }

    # -- score ------------------------------------------------------------------
    def score(self, state_0: FrameState, state_t: FrameState, t: jnp.ndarray,
              mask: jnp.ndarray | None = None) -> dict:
        """Scores of state_t given predicted clean frames state_0
        (reference frame.py:109-143)."""
        if self.rotation is None:
            rot_score = jnp.zeros(state_0.quat.shape[:-1] + (3,), state_0.quat.dtype)
        else:
            quat_0t = rot.quat_multiply(rot.quat_conjugate(state_0.quat), state_t.quat)
            rotvec_0t = rot.quat_to_axis_angle(quat_0t)
            rot_score = self.rotation.score(rotvec_0t, t)

        if self.trans is None:
            trans_score = jnp.zeros_like(state_0.trans)
        else:
            trans_score = self.trans.score(state_t.trans, state_0.trans, t, scale=True)

        if mask is not None:
            trans_score = trans_score * mask[..., None]
            rot_score = rot_score * mask[..., None]
        return {"trans_score": trans_score, "rot_score": rot_score}

    def score_scaling(self, t: jnp.ndarray) -> dict:
        return {
            "trans_score_scaling": self.trans.score_scaling(t),
            "rot_score_scaling": self.rotation.score_scaling(t),
        }

    # -- reverse -----------------------------------------------------------------
    def reverse(self, key: jax.Array, state_t: FrameState,
                rot_score: jnp.ndarray, trans_score: jnp.ndarray,
                t: jnp.ndarray, dt, diffuse_mask: jnp.ndarray | None = None,
                center_trans: bool = True, center_mask: jnp.ndarray | None = None,
                noise_scale: float = 1.0, probability_flow: bool = True) -> FrameState:
        """One reverse step t -> t - dt (reference frame.py:153-210).

        dt may be a scalar or a per-sample array (for the batched delta grid).
        """
        k_rot, k_trans = jax.random.split(key)

        if self.rotation is not None:
            quat_1 = self.rotation.reverse_quat(
                k_rot, state_t.quat, rot_score, t, dt,
                noise_scale=noise_scale, probability_flow=probability_flow)
        else:
            quat_1 = state_t.quat

        if self.trans is not None:
            trans_1 = self.trans.reverse(
                k_trans, state_t.trans, trans_score, t, dt,
                center=center_trans, center_mask=center_mask,
                noise_scale=noise_scale, probability_flow=probability_flow)
        else:
            trans_1 = state_t.trans

        if diffuse_mask is not None:
            m = diffuse_mask[..., None].astype(trans_1.dtype)
            quat_1 = jnp.where(m > 0, quat_1, state_t.quat)
            trans_1 = _apply_mask(trans_1, state_t.trans, m)
        return FrameState(quat_1, trans_1)

    # -- prior -------------------------------------------------------------------
    def sample_prior(self, key: jax.Array, shape: tuple,
                     reference: FrameState | None = None,
                     diffuse_mask: jnp.ndarray | None = None) -> FrameState:
        """Frames from the t=1 reference distribution:
        IGSO(3)-near-uniform rotations x N(0, I) translations."""
        k_rot, k_trans = jax.random.split(key)
        if self.rotation is not None:
            rotvec = self.rotation.sample_prior(k_rot, shape + (3,))
            quat = rot.axis_angle_to_quat(rotvec)
        else:
            quat = reference.quat
        if self.trans is not None:
            trans_scaled = self.trans.sample_prior(k_trans, shape + (3,))
            trans = self.trans.unscale(trans_scaled)
        else:
            trans = reference.trans
        if diffuse_mask is not None:
            m = diffuse_mask[..., None]
            quat = jnp.where(m > 0, quat, reference.quat)
            trans = _apply_mask(trans, reference.trans, m)
        return FrameState(quat, trans)
