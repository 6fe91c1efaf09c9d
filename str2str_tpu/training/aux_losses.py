"""Auxiliary structure losses and violation metrics (config-gated extras).

Capability parity with the dormant OpenFold loss library shipped by the
reference (`/root/reference/src/models/loss.py:54-1544`). None of these are
enabled by the reference's default config (configs/model/diffusion.yaml:64-78)
but they are part of its surface; this module provides the jnp equivalents of
the pieces relevant to backbone diffusion:

  * `compute_fape`, `backbone_fape_loss`  (loss.py:78-211)
  * `distogram_loss`                       (loss.py:515)
  * `supervised_chi_loss`                  (loss.py:286, for psi here)
  * `between_residue_bond_loss`            (loss.py:714)
  * `between_residue_clash_loss`           (loss.py:873, backbone subset)
  * `violation_metrics`                    (loss.py:1274)
"""
from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..geometry import chemical as ch
from ..geometry.rigid import Rigid


def compute_fape(pred_frames: Rigid, target_frames: Rigid,
                 frames_mask: jnp.ndarray,
                 pred_positions: jnp.ndarray, target_positions: jnp.ndarray,
                 positions_mask: jnp.ndarray,
                 length_scale: float = 10.0,
                 l1_clamp_distance: Optional[float] = 10.0,
                 eps: float = 1e-8) -> jnp.ndarray:
    """Frame-aligned point error (AF2 Alg. 28). Frames (..., F), points
    (..., P, 3). Returns (...)."""
    inv = pred_frames.invert()
    local_pred = inv.expand_dims(-1).apply(pred_positions[..., None, :, :])
    inv_t = target_frames.invert()
    local_tgt = inv_t.expand_dims(-1).apply(target_positions[..., None, :, :])

    err = jnp.sqrt(jnp.sum((local_pred - local_tgt) ** 2, axis=-1) + eps)
    if l1_clamp_distance is not None:
        err = jnp.clip(err, 0.0, l1_clamp_distance)
    err = err / length_scale
    err = err * frames_mask[..., None] * positions_mask[..., None, :]
    err = jnp.sum(err, axis=-1) / (eps + jnp.sum(frames_mask, axis=-1))[..., None]
    return jnp.sum(err, axis=-1) / (eps + jnp.sum(positions_mask, axis=-1))


def backbone_fape_loss(pred_rigids: Rigid, gt_rigids: Rigid,
                       mask: jnp.ndarray, clamp_distance: float = 10.0,
                       loss_unit_distance: float = 10.0) -> jnp.ndarray:
    """Backbone FAPE with frames as points (reference backbone_loss,
    loss.py:154-211, single-trajectory form)."""
    fape = compute_fape(
        pred_rigids, gt_rigids, mask,
        pred_rigids.trans, gt_rigids.trans, mask,
        length_scale=loss_unit_distance, l1_clamp_distance=clamp_distance)
    return jnp.mean(fape)


def distogram_loss(logits: jnp.ndarray, pseudo_beta: jnp.ndarray,
                   pseudo_beta_mask: jnp.ndarray,
                   min_bin: float = 2.3125, max_bin: float = 21.6875,
                   no_bins: int = 64, eps: float = 1e-6) -> jnp.ndarray:
    """Cross-entropy over binned pseudo-beta distances (loss.py:515)."""
    boundaries = jnp.linspace(min_bin, max_bin, no_bins - 1) ** 2
    d2 = jnp.sum(
        (pseudo_beta[..., :, None, :] - pseudo_beta[..., None, :, :]) ** 2,
        axis=-1, keepdims=True)
    true_bins = jnp.sum(d2 > boundaries, axis=-1)
    log_p = jnp.take_along_axis(
        jnp.log(jnp.clip(jnp.exp(logits
                                 - jnp.max(logits, -1, keepdims=True)), 1e-30)
                / jnp.sum(jnp.exp(logits - jnp.max(logits, -1, keepdims=True)),
                          -1, keepdims=True)),
        true_bins[..., None], axis=-1)[..., 0]
    square_mask = pseudo_beta_mask[..., :, None] * pseudo_beta_mask[..., None, :]
    mean = -jnp.sum(log_p * square_mask, axis=(-1, -2)) / (
        eps + jnp.sum(square_mask, axis=(-1, -2)))
    return jnp.mean(mean)


def supervised_torsion_loss(pred_sin_cos: jnp.ndarray,
                            unnormalized_sin_cos: jnp.ndarray,
                            gt_sin_cos: jnp.ndarray,
                            alt_gt_sin_cos: jnp.ndarray,
                            torsion_mask: jnp.ndarray,
                            angle_norm_weight: float = 0.02,
                            eps: float = 1e-6) -> jnp.ndarray:
    """Torsion-angle loss (AF2 Alg. 27) with pi-periodic alternatives; works
    for any subset of torsions (psi-only in this model)."""
    sq = jnp.sum((gt_sin_cos - pred_sin_cos) ** 2, axis=-1)
    sq_alt = jnp.sum((alt_gt_sin_cos - pred_sin_cos) ** 2, axis=-1)
    err = jnp.minimum(sq, sq_alt)
    denom = eps + jnp.sum(torsion_mask)
    loss = jnp.sum(err * torsion_mask) / denom

    norm = jnp.sqrt(jnp.sum(unnormalized_sin_cos ** 2, axis=-1) + eps)
    norm_err = jnp.abs(norm - 1.0)
    loss = loss + angle_norm_weight * jnp.sum(norm_err * torsion_mask) / denom
    return loss


def between_residue_bond_loss(pred_atom_pos: jnp.ndarray,
                              pred_atom_mask: jnp.ndarray,
                              residue_index: jnp.ndarray,
                              aatype: jnp.ndarray,
                              tolerance_factor: float = 12.0,
                              eps: float = 1e-6) -> Dict[str, jnp.ndarray]:
    """C-N peptide bond length/angle violations between consecutive residues
    (reference loss.py:714, atom14 layout: N=0, CA=1, C=2)."""
    this_c = pred_atom_pos[..., :-1, 2, :]
    this_ca = pred_atom_pos[..., :-1, 1, :]
    next_n = pred_atom_pos[..., 1:, 0, :]
    next_ca = pred_atom_pos[..., 1:, 1, :]
    mask = (pred_atom_mask[..., :-1, 2] * pred_atom_mask[..., 1:, 0]
            * (residue_index[..., 1:] - residue_index[..., :-1] == 1))

    next_is_pro = (aatype[..., 1:] == ch.restype_order["P"]).astype(jnp.float32)
    gt_len = ((1.0 - next_is_pro) * ch.between_res_bond_length_c_n[0]
              + next_is_pro * ch.between_res_bond_length_c_n[1])
    gt_std = ((1.0 - next_is_pro) * ch.between_res_bond_length_stddev_c_n[0]
              + next_is_pro * ch.between_res_bond_length_stddev_c_n[1])

    c_n = jnp.sqrt(jnp.sum((next_n - this_c) ** 2, -1) + eps)
    len_err = jnp.abs(c_n - gt_len)
    len_viol = (len_err > tolerance_factor * gt_std).astype(jnp.float32)

    # bond angles via unit vectors
    ca_c = (this_c - this_ca) / jnp.linalg.norm(this_c - this_ca + eps, axis=-1, keepdims=True)
    cn = (next_n - this_c) / c_n[..., None]
    n_ca = (next_ca - next_n) / jnp.linalg.norm(next_ca - next_n + eps, axis=-1, keepdims=True)

    cos_ca_c_n = jnp.sum(ca_c * cn, -1)
    cos_c_n_ca = jnp.sum(-cn * n_ca, -1)
    ang1_err = jnp.abs(cos_ca_c_n - ch.between_res_cos_angles_ca_c_n[0])
    ang2_err = jnp.abs(cos_c_n_ca - ch.between_res_cos_angles_c_n_ca[0])
    ang1_viol = (ang1_err > tolerance_factor
                 * ch.between_res_cos_angles_ca_c_n[1]).astype(jnp.float32)
    ang2_viol = (ang2_err > tolerance_factor
                 * ch.between_res_cos_angles_c_n_ca[1]).astype(jnp.float32)

    denom = jnp.sum(mask, -1) + eps
    return {
        "c_n_loss_mean": jnp.sum(len_err * mask, -1) / denom,
        "angles_loss_mean": jnp.sum((ang1_err + ang2_err) * mask, -1) / denom,
        "per_residue_violation": jnp.maximum(
            jnp.maximum(len_viol, ang1_viol), ang2_viol) * mask,
    }


def between_residue_clash_loss(pred_atom_pos: jnp.ndarray,
                               pred_atom_mask: jnp.ndarray,
                               aatype: jnp.ndarray,
                               residue_index: jnp.ndarray,
                               overlap_tolerance: float = 1.5,
                               eps: float = 1e-6) -> Dict[str, jnp.ndarray]:
    """Non-bonded inter-residue atom clash penalty on the atom14 layout
    (reference loss.py:873; van-der-Waals radii by element)."""
    radii_by_elem = ch.van_der_waals_radius
    # Per (restype, atom14) radius table.
    table = np.zeros((ch.restype_num + 1, 14), np.float32)
    for ri, one in enumerate(ch.restypes):
        names = ch.restype_name_to_atom14_names[ch.restype_1to3[one]]
        for ai, nm in enumerate(names):
            if nm:
                table[ri, ai] = radii_by_elem[nm[0]]
    radius = jnp.take(jnp.asarray(table), jnp.clip(aatype, 0, ch.restype_num), axis=0)
    radius = radius * pred_atom_mask

    B = pred_atom_pos.shape[0]
    L = pred_atom_pos.shape[-3]
    flat_pos = pred_atom_pos.reshape(B, L * 14, 3)
    flat_r = radius.reshape(B, L * 14)
    flat_mask = pred_atom_mask.reshape(B, L * 14)

    d = jnp.sqrt(jnp.sum(
        (flat_pos[:, :, None] - flat_pos[:, None, :]) ** 2, -1) + eps)
    pair_mask = flat_mask[:, :, None] * flat_mask[:, None, :]
    # exclude same-residue pairs and bonded C-N neighbors
    res_of = jnp.repeat(residue_index, 14, axis=-1)
    same_res = res_of[:, :, None] == res_of[:, None, :]
    atom_of = jnp.tile(jnp.arange(14), (L,))
    is_c = (atom_of == 2)[None, :, None] & (res_of[:, :, None] + 1 == res_of[:, None, :]) & (atom_of == 0)[None, None, :]
    is_n = (atom_of == 0)[None, :, None] & (res_of[:, :, None] - 1 == res_of[:, None, :]) & (atom_of == 2)[None, None, :]
    pair_mask = pair_mask * (1.0 - same_res) * (1.0 - is_c) * (1.0 - is_n)

    low = flat_r[:, :, None] + flat_r[:, None, :] - overlap_tolerance
    viol = jnp.maximum(low - d, 0.0) * pair_mask
    return {
        "mean_loss": jnp.sum(viol, (-1, -2)) / (1e-6 + jnp.sum(pair_mask, (-1, -2))),
        "per_atom_clash": jnp.sum(viol, -1).reshape(B, L, 14),
    }


def violation_metrics(pred_atom14: jnp.ndarray, atom14_mask: jnp.ndarray,
                      residue_index: jnp.ndarray, aatype: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Summary violation metrics (reference compute_violation_metrics,
    loss.py:1274): bond violations + clashes per example."""
    bonds = between_residue_bond_loss(pred_atom14, atom14_mask, residue_index, aatype)
    clashes = between_residue_clash_loss(pred_atom14, atom14_mask, aatype, residue_index)
    return {
        "violations_between_residue_bond":
            jnp.mean(jnp.max(bonds["per_residue_violation"], axis=-1)),
        "violations_between_residue_clash":
            jnp.mean((jnp.sum(clashes["per_atom_clash"], (-1, -2)) > 0)
                     .astype(jnp.float32)),
        "c_n_loss": jnp.mean(bonds["c_n_loss_mean"]),
        "clash_loss": jnp.mean(clashes["mean_loss"]),
    }
