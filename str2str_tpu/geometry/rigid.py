"""SE(3) rigid transforms as a jnp pytree.

A `Rigid` is a NamedTuple of a rotation matrix field (..., 3, 3) and a
translation field (..., 3) — automatically a pytree, so it flows through
jit/vmap/scan without custom registration. All operations are free functions
or thin methods over jnp arrays; there is no mutable object state, unlike the
reference's `Rigid`/`Rotation` classes (rigid_utils.py:291,856) which this
layer matches in capability.

For the score-network trunk a quaternion state is more natural (the backbone
update composes quaternion increments); see `quat_compose_update` below, which
mirrors `Rigid.compose_q_update_vec` (reference rigid_utils.py:1042).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from . import rotations as rot

__all__ = ["Rigid", "quat_compose_update", "from_3_points"]


class Rigid(NamedTuple):
    rot: jnp.ndarray    # (..., 3, 3)
    trans: jnp.ndarray  # (..., 3)

    # -- constructors -------------------------------------------------------
    @staticmethod
    def identity(shape=(), dtype=jnp.float32) -> "Rigid":
        return Rigid(
            jnp.broadcast_to(jnp.eye(3, dtype=dtype), shape + (3, 3)),
            jnp.zeros(shape + (3,), dtype=dtype),
        )

    @staticmethod
    def from_tensor_4x4(t: jnp.ndarray) -> "Rigid":
        """(..., 4, 4) homogeneous matrix -> Rigid."""
        return Rigid(t[..., :3, :3], t[..., :3, 3])

    @staticmethod
    def from_tensor_7(t: jnp.ndarray, normalize_quats: bool = True) -> "Rigid":
        """(..., 7) = (quat wxyz, trans xyz) -> Rigid."""
        q, tr = t[..., :4], t[..., 4:]
        if normalize_quats:
            q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
        return Rigid(rot.quat_to_matrix(q), tr)

    @staticmethod
    def from_quat_trans(q: jnp.ndarray, trans: jnp.ndarray) -> "Rigid":
        return Rigid(rot.quat_to_matrix(q), trans)

    @staticmethod
    def from_axis_angle_trans(v: jnp.ndarray, trans: jnp.ndarray) -> "Rigid":
        return Rigid(rot.axis_angle_to_matrix(v), trans)

    # -- exports -------------------------------------------------------------
    def to_tensor_4x4(self) -> jnp.ndarray:
        shape = self.trans.shape[:-1]
        t = jnp.zeros(shape + (4, 4), dtype=self.trans.dtype)
        t = t.at[..., :3, :3].set(self.rot)
        t = t.at[..., :3, 3].set(self.trans)
        return t.at[..., 3, 3].set(1.0)

    def to_tensor_7(self) -> jnp.ndarray:
        return jnp.concatenate([rot.matrix_to_quat(self.rot), self.trans], axis=-1)

    def quats(self) -> jnp.ndarray:
        return rot.matrix_to_quat(self.rot)

    def axis_angle(self) -> jnp.ndarray:
        return rot.matrix_to_axis_angle(self.rot)

    # -- algebra -------------------------------------------------------------
    @property
    def shape(self):
        return self.trans.shape[:-1]

    def apply(self, pts: jnp.ndarray) -> jnp.ndarray:
        """Apply to points (..., 3); leading dims broadcast."""
        return jnp.einsum("...ij,...j->...i", self.rot, pts, precision=lax.Precision.HIGHEST) + self.trans

    def invert_apply(self, pts: jnp.ndarray) -> jnp.ndarray:
        return jnp.einsum("...ji,...j->...i", self.rot, pts - self.trans, precision=lax.Precision.HIGHEST)

    def compose(self, other: "Rigid") -> "Rigid":
        """self ∘ other (apply `other` first in point space: x -> self(other(x)))."""
        return Rigid(
            jnp.einsum("...ij,...jk->...ik", self.rot, other.rot, precision=lax.Precision.HIGHEST),
            jnp.einsum("...ij,...j->...i", self.rot, other.trans, precision=lax.Precision.HIGHEST) + self.trans,
        )

    def invert(self) -> "Rigid":
        inv_rot = jnp.swapaxes(self.rot, -1, -2)
        return Rigid(inv_rot, -jnp.einsum("...ij,...j->...i", inv_rot, self.trans, precision=lax.Precision.HIGHEST))

    def compose_rotation(self, rot_mat: jnp.ndarray) -> "Rigid":
        """Right-compose a rotation only (translation unchanged)."""
        return Rigid(jnp.einsum("...ij,...jk->...ik", self.rot, rot_mat, precision=lax.Precision.HIGHEST), self.trans)

    def scale_translation(self, factor) -> "Rigid":
        return Rigid(self.rot, self.trans * factor)

    def expand_dims(self, axis: int) -> "Rigid":
        """Insert a broadcast axis into the shared batch shape (axis counts
        into `shape`, i.e. excludes the trailing matrix/vector dims)."""
        if axis < 0:
            axis = len(self.shape) + 1 + axis
        return Rigid(
            jnp.expand_dims(self.rot, axis), jnp.expand_dims(self.trans, axis)
        )

    def __getitem__(self, idx) -> "Rigid":
        if not isinstance(idx, tuple):
            idx = (idx,)
        return Rigid(self.rot[idx + (slice(None), slice(None))], self.trans[idx + (slice(None),)])


def quat_compose_update(quat: jnp.ndarray, trans: jnp.ndarray,
                        update_vec: jnp.ndarray,
                        update_mask: jnp.ndarray | None = None):
    """Compose a rigid (quat, trans) with a 6-vector update.

    The first 3 components b,c,d define the (unnormalized) update quaternion
    (1, b, c, d); the last 3 are a translation update expressed in the local
    frame (rotated by the *pre-update* rotation before being added).
    Matches reference rigid_utils.py:1042 `Rigid.compose_q_update_vec`.

    Returns (new_quat [normalized], new_trans).
    """
    q_vec, t_vec = update_vec[..., :3], update_vec[..., 3:]
    dq = rot.quat_multiply(
        quat, jnp.concatenate([jnp.zeros_like(q_vec[..., :1]), q_vec], axis=-1)
    )
    if update_mask is not None:
        dq = dq * update_mask
    new_quat = quat + dq
    new_quat = new_quat / jnp.linalg.norm(new_quat, axis=-1, keepdims=True)

    t_update = rot.quat_rotate(quat, t_vec)
    if update_mask is not None:
        t_update = t_update * update_mask
    return new_quat, trans + t_update


def from_3_points(p_neg_x_axis: jnp.ndarray, origin: jnp.ndarray,
                  p_xy_plane: jnp.ndarray, eps: float = 1e-8) -> Rigid:
    """Gram–Schmidt frame construction (AF2 Algorithm 21).

    x-axis points from `p_neg_x_axis` to `origin`; `p_xy_plane` fixes the
    xy-halfplane. Matches reference rigid_utils.py:1236.
    """
    e0 = origin - p_neg_x_axis
    e1 = p_xy_plane - origin
    e0 = e0 / jnp.sqrt(jnp.sum(e0 * e0, axis=-1, keepdims=True) + eps)
    e1 = e1 - e0 * jnp.sum(e0 * e1, axis=-1, keepdims=True)
    e1 = e1 / jnp.sqrt(jnp.sum(e1 * e1, axis=-1, keepdims=True) + eps)
    e2 = jnp.cross(e0, e1)
    rot_mat = jnp.stack([e0, e1, e2], axis=-1)  # columns are the axes
    return Rigid(rot_mat, origin)
