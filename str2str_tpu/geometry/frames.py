"""Backbone/all-atom frame conversions (AF2 Algorithms 21/24), in pure jnp.

Covers the reference's featurization + reconstruction geometry:
  * `atom37_to_frames`            (reference data_transforms.py:758)
  * `atom37_to_torsion_angles`    (reference data_transforms.py:925)
  * `torsion_angles_to_frames`    (reference all_atom.py:21)
  * `frames_to_atom14_pos`        (reference all_atom.py:99)
  * `compute_backbone`            (reference all_atom.py:141)
  * `make_atom14_masks/positions` (reference data_transforms.py:575,656)
  * `pseudo_beta`                 (reference data_transforms.py:391)

Everything is static-shape, jit/vmap-safe, and uses `jnp.take` for table
lookups (the reference hops to CPU for aatype indexing, all_atom.py:150-154 —
that hop does not exist here).
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax
import numpy as np

from . import chemical as ch
from .rigid import Rigid, from_3_points

# Device-constant copies of the lookup tables (created lazily at trace time
# from the numpy originals; XLA hoists them into the executable).
_f32 = np.float32


def _take(table: np.ndarray, aatype: jnp.ndarray) -> jnp.ndarray:
    """table[aatype] with aatype of any batch shape."""
    return jnp.take(jnp.asarray(table), aatype, axis=0)


def atom37_to_frames(aatype: jnp.ndarray, atom37_pos: jnp.ndarray,
                     atom37_mask: jnp.ndarray, eps: float = 1e-8) -> dict:
    """Ground-truth rigid frames of the 8 rigid groups per residue.

    Args:
        aatype: (..., N) int
        atom37_pos: (..., N, 37, 3)
        atom37_mask: (..., N, 37)
    Returns dict with:
        rigidgroups_gt_frames: (..., N, 8, 4, 4)
        rigidgroups_gt_exists / group_exists: (..., N, 8)
        rigidgroups_group_is_ambiguous: (..., N, 8)
        rigidgroups_alt_gt_frames: (..., N, 8, 4, 4)
    """
    aatype = jnp.clip(aatype, 0, ch.unk_restype_index)
    base_idx = _take(ch.frame_base_atom37_idx, aatype)          # (..., N, 8, 3)
    group_exists = _take(ch.rigid_group_mask, aatype)           # (..., N, 8)

    # Gather the 3 base atoms of each group: (..., N, 8, 3, 3).
    base_pos = jnp.take_along_axis(
        atom37_pos[..., None, :, :],
        base_idx[..., None].repeat(3, axis=-1)[..., :, :, :],
        axis=-2,
    )
    base_mask = jnp.take_along_axis(atom37_mask[..., None, :], base_idx, axis=-1)

    frames = from_3_points(
        p_neg_x_axis=base_pos[..., 0, :],
        origin=base_pos[..., 1, :],
        p_xy_plane=base_pos[..., 2, :],
        eps=eps,
    )
    gt_exists = jnp.min(base_mask, axis=-1) * group_exists

    # The backbone group's frame is flipped (x, z -> -x, -z) by convention.
    flip = np.tile(np.eye(3, dtype=_f32), (8, 1, 1))
    flip[0, 0, 0] = -1.0
    flip[0, 2, 2] = -1.0
    frames = frames.compose_rotation(jnp.asarray(flip))

    ambiguity_rot = _take(ch.rigid_group_ambiguity_rot, aatype)  # (..., N, 8, 3, 3)
    is_ambiguous = _take(ch.rigid_group_is_ambiguous, aatype)
    alt_frames = frames.compose_rotation(ambiguity_rot)

    return {
        "rigidgroups_gt_frames": frames.to_tensor_4x4(),
        "rigidgroups_gt_exists": gt_exists,
        "rigidgroups_group_exists": group_exists,
        "rigidgroups_group_is_ambiguous": is_ambiguous,
        "rigidgroups_alt_gt_frames": alt_frames.to_tensor_4x4(),
    }


def atom37_to_torsion_angles(aatype: jnp.ndarray, atom37_pos: jnp.ndarray,
                             atom37_mask: jnp.ndarray) -> dict:
    """The 7 torsion angles (pre-omega, phi, psi, chi1-4) as sin/cos pairs.

    Returns dict with torsion_angles_sin_cos (..., N, 7, 2),
    alt_torsion_angles_sin_cos, torsion_angles_mask (..., N, 7).
    """
    aatype = jnp.clip(aatype, 0, ch.unk_restype_index)
    dtype = atom37_pos.dtype

    pad_pos = jnp.zeros_like(atom37_pos[..., :1, :, :])
    prev_pos = jnp.concatenate([pad_pos, atom37_pos[..., :-1, :, :]], axis=-3)
    pad_mask = jnp.zeros_like(atom37_mask[..., :1, :])
    prev_mask = jnp.concatenate([pad_mask, atom37_mask[..., :-1, :]], axis=-2)

    # Backbone torsions from fixed atom37 slots (N=0, CA=1, C=2, O=4).
    pre_omega_pos = jnp.concatenate(
        [prev_pos[..., 1:3, :], atom37_pos[..., :2, :]], axis=-2)
    phi_pos = jnp.concatenate(
        [prev_pos[..., 2:3, :], atom37_pos[..., :3, :]], axis=-2)
    psi_pos = jnp.concatenate(
        [atom37_pos[..., :3, :], atom37_pos[..., 4:5, :]], axis=-2)

    pre_omega_mask = jnp.prod(prev_mask[..., 1:3], axis=-1) * jnp.prod(
        atom37_mask[..., :2], axis=-1)
    phi_mask = prev_mask[..., 2] * jnp.prod(atom37_mask[..., :3], axis=-1)
    psi_mask = jnp.prod(atom37_mask[..., :3], axis=-1) * atom37_mask[..., 4]

    # Chi torsions via per-restype atom index tables.
    chi_idx = _take(ch.chi_atom37_indices, aatype)               # (..., N, 4, 4)
    chi_pos = jnp.take_along_axis(
        atom37_pos[..., None, :, :],
        chi_idx[..., None].repeat(3, axis=-1),
        axis=-2,
    )                                                            # (..., N, 4, 4, 3)
    chi_atom_mask = jnp.take_along_axis(atom37_mask[..., None, :], chi_idx, axis=-1)
    chis_mask = _take(ch.chi_angles_mask_array, aatype) * jnp.prod(chi_atom_mask, axis=-1)

    torsion_pos = jnp.concatenate(
        [pre_omega_pos[..., None, :, :], phi_pos[..., None, :, :],
         psi_pos[..., None, :, :], chi_pos], axis=-3)            # (..., N, 7, 4, 3)
    torsion_mask = jnp.concatenate(
        [pre_omega_mask[..., None], phi_mask[..., None],
         psi_mask[..., None], chis_mask], axis=-1)               # (..., N, 7)

    frames = from_3_points(
        p_neg_x_axis=torsion_pos[..., 1, :],
        origin=torsion_pos[..., 2, :],
        p_xy_plane=torsion_pos[..., 0, :],
    )
    fourth_local = frames.invert_apply(torsion_pos[..., 3, :])
    sin_cos = jnp.stack([fourth_local[..., 2], fourth_local[..., 1]], axis=-1)
    sin_cos = sin_cos / jnp.sqrt(
        jnp.sum(sin_cos**2, axis=-1, keepdims=True) + 1e-8)

    # AF2 sign convention: psi is negated.
    sign = jnp.asarray([1.0, 1.0, -1.0, 1.0, 1.0, 1.0, 1.0], dtype=dtype)
    sin_cos = sin_cos * sign[..., :, None]

    pi_periodic = _take(np.asarray(ch.chi_pi_periodic, dtype=_f32), aatype)
    mirror = jnp.concatenate(
        [jnp.ones_like(pi_periodic[..., :3]), 1.0 - 2.0 * pi_periodic], axis=-1)
    alt_sin_cos = sin_cos * mirror[..., None]

    return {
        "torsion_angles_sin_cos": sin_cos,
        "alt_torsion_angles_sin_cos": alt_sin_cos,
        "torsion_angles_mask": torsion_mask,
    }


def torsion_angles_to_frames(bb_rigids: Rigid, angles_sin_cos: jnp.ndarray,
                             aatype: jnp.ndarray) -> Rigid:
    """Backbone frames + 7 torsions -> all 8 rigid-group frames in global
    coordinates (AF2 Algorithm 24). angles_sin_cos: (..., N, 7, 2)."""
    default_4x4 = _take(ch.restype_rigid_group_default_frame, aatype)
    default_r = Rigid.from_tensor_4x4(default_4x4)               # (..., N, 8)

    # Prepend the identity rotation (sin=0, cos=1) for the backbone group.
    bb_rot = jnp.zeros_like(angles_sin_cos[..., :1, :])
    bb_rot = bb_rot.at[..., 1].set(1.0)
    alpha = jnp.concatenate([bb_rot, angles_sin_cos], axis=-2)   # (..., N, 8, 2)

    sin_a, cos_a = alpha[..., 0], alpha[..., 1]
    zeros = jnp.zeros_like(sin_a)
    ones = jnp.ones_like(sin_a)
    # Rotation about the x-axis by each torsion angle.
    rot_x = jnp.stack(
        [ones, zeros, zeros,
         zeros, cos_a, -sin_a,
         zeros, sin_a, cos_a], axis=-1).reshape(sin_a.shape + (3, 3))

    all_frames = default_r.compose(Rigid(rot_x, jnp.zeros(sin_a.shape + (3,), rot_x.dtype)))

    # Chain the chi frames: chi_k is defined relative to chi_{k-1}.
    chi1 = all_frames[..., 4]
    chi2 = chi1.compose(all_frames[..., 5])
    chi3 = chi2.compose(all_frames[..., 6])
    chi4 = chi3.compose(all_frames[..., 7])

    chained = [r.expand_dims(-1) for r in (chi2, chi3, chi4)]
    all_to_bb = Rigid(
        jnp.concatenate([all_frames.rot[..., :5, :, :]] + [r.rot for r in chained], axis=-3),
        jnp.concatenate([all_frames.trans[..., :5, :]] + [r.trans for r in chained], axis=-2),
    )
    return bb_rigids.expand_dims(-1).compose(all_to_bb)


def frames_to_atom14_pos(group_frames: Rigid, aatype: jnp.ndarray) -> jnp.ndarray:
    """Place idealized atom14 coordinates with their group frames.

    group_frames: Rigid of shape (..., N, 8). Returns (..., N, 14, 3)."""
    group_idx = _take(ch.restype_atom14_to_rigid_group, aatype)   # (..., N, 14)
    # Select each atom's frame by one-hot contraction over the 8 groups
    # (gather-free: XLA lowers this to tiny matmuls).
    onehot = (group_idx[..., None] == jnp.arange(8)).astype(group_frames.rot.dtype)
    rot = jnp.einsum("...gij,...ag->...aij", group_frames.rot, onehot, precision=lax.Precision.HIGHEST)
    trans = jnp.einsum("...gi,...ag->...ai", group_frames.trans, onehot, precision=lax.Precision.HIGHEST)

    lit_pos = _take(ch.restype_atom14_rigid_group_positions, aatype)  # (..., N, 14, 3)
    atom_mask = _take(ch.restype_atom14_mask, aatype)[..., None]
    pos = jnp.einsum("...aij,...aj->...ai", rot, lit_pos, precision=lax.Precision.HIGHEST) + trans
    return pos * atom_mask


def compute_backbone(bb_rigids: Rigid, psi_sin_cos: jnp.ndarray,
                     aatype: jnp.ndarray | None = None):
    """Backbone rigids + psi torsion -> (atom37_pos, atom37_mask, atom14_pos).

    Only the psi angle is supplied (..., N, 2); the remaining six torsions are
    tiled copies that only influence side-chain groups whose atoms are masked
    out of the backbone anyway (matches reference all_atom.py:141).
    """
    if aatype is None:
        aatype = jnp.zeros(bb_rigids.shape, dtype=jnp.int32)
    angles = jnp.broadcast_to(
        psi_sin_cos[..., None, :], psi_sin_cos.shape[:-1] + (7, 2))
    frames = torsion_angles_to_frames(bb_rigids, angles, aatype)
    atom14 = frames_to_atom14_pos(frames, aatype)

    # atom14 backbone order: N, CA, C, O, CB -> atom37 order: N, CA, C, CB, O.
    n37 = ch.atom_type_num
    atom37 = jnp.zeros(bb_rigids.shape + (n37, 3), dtype=atom14.dtype)
    atom37 = atom37.at[..., 0:3, :].set(atom14[..., 0:3, :])
    atom37 = atom37.at[..., 3, :].set(atom14[..., 4, :])
    atom37 = atom37.at[..., 4, :].set(atom14[..., 3, :])
    atom37_mask = jnp.any(atom37 != 0.0, axis=-1)
    return atom37, atom37_mask, atom14


def make_atom14_masks(aatype: jnp.ndarray) -> dict:
    """Per-residue atom14/atom37 index maps and existence masks."""
    aatype = jnp.clip(aatype, 0, ch.unk_restype_index)
    return {
        "atom14_atom_exists": _take(ch.restype_atom14_exists, aatype),
        "residx_atom14_to_atom37": _take(ch.restype_atom14_to_atom37, aatype),
        "residx_atom37_to_atom14": _take(ch.restype_atom37_to_atom14, aatype),
        "atom37_atom_exists": _take(ch.restype_atom37_exists, aatype),
    }


def make_atom14_positions(aatype: jnp.ndarray, atom37_pos: jnp.ndarray,
                          atom37_mask: jnp.ndarray) -> dict:
    """Gather atom37 ground truth into the compact atom14 layout."""
    masks = make_atom14_masks(aatype)
    idx = masks["residx_atom14_to_atom37"]
    gt_mask = masks["atom14_atom_exists"] * jnp.take_along_axis(
        atom37_mask, idx, axis=-1)
    gt_pos = jnp.take_along_axis(atom37_pos, idx[..., None], axis=-2) * gt_mask[..., None]
    return {
        **masks,
        "atom14_gt_exists": gt_mask,
        "atom14_gt_positions": gt_pos,
    }


def pseudo_beta(aatype: jnp.ndarray, atom37_pos: jnp.ndarray,
                atom37_mask: jnp.ndarray):
    """CB position (CA for glycine): the AF2 pseudo-beta feature."""
    is_gly = aatype == ch.restype_order["G"]
    ca, cb = ch.CA_IDX, ch.atom_order["CB"]
    pb = jnp.where(is_gly[..., None], atom37_pos[..., ca, :], atom37_pos[..., cb, :])
    pb_mask = jnp.where(is_gly, atom37_mask[..., ca], atom37_mask[..., cb])
    return pb, pb_mask
