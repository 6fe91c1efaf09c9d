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

import jax
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

    # Bond angles via unit vectors. c_ca points C->CA (reference
    # loss.py:803): the CA-C-N angle's cosine constant (-0.4473 at the
    # ideal 116.2 deg) is defined for vectors FROM the vertex atom C.
    # eps regularizes the squared norm (a guard added to the components
    # would bias every unit vector instead).
    def unit(v):
        return v / jnp.sqrt(eps + jnp.sum(v ** 2, axis=-1, keepdims=True))

    ca_c = unit(this_ca - this_c)
    cn = (next_n - this_c) / c_n[..., None]
    n_ca = unit(next_ca - next_n)

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


# ---------------------------------------------------------------------------
# Confidence heads & structure metrics (dormant in the reference's default
# config but part of its loss-library surface, loss.py:370-713, 1020-1544).


def compute_plddt(logits: jnp.ndarray) -> jnp.ndarray:
    """Expected per-residue lDDT from binned logits, in [0, 100]
    (reference compute_plddt, loss.py:370-382)."""
    num_bins = logits.shape[-1]
    width = 1.0 / num_bins
    centers = jnp.arange(0.5 * width, 1.0, width)
    probs = jnp.exp(logits - jnp.max(logits, -1, keepdims=True))
    probs = probs / jnp.sum(probs, -1, keepdims=True)
    return jnp.sum(probs * centers, axis=-1) * 100.0


def lddt(pred_pos: jnp.ndarray, gt_pos: jnp.ndarray, mask: jnp.ndarray,
         cutoff: float = 15.0, eps: float = 1e-10,
         per_residue: bool = True) -> jnp.ndarray:
    """Local distance difference test over a point set (reference lddt,
    loss.py:385-437). pred/gt (..., N, 3), mask (..., N, 1)."""
    n = mask.shape[-2]
    d_true = jnp.sqrt(eps + jnp.sum(
        (gt_pos[..., :, None, :] - gt_pos[..., None, :, :]) ** 2, -1))
    d_pred = jnp.sqrt(eps + jnp.sum(
        (pred_pos[..., :, None, :] - pred_pos[..., None, :, :]) ** 2, -1))
    scored = ((d_true < cutoff).astype(jnp.float32)
              * mask * jnp.swapaxes(mask, -1, -2)
              * (1.0 - jnp.eye(n)))
    l1 = jnp.abs(d_true - d_pred)
    score = 0.25 * ((l1 < 0.5).astype(jnp.float32)
                    + (l1 < 1.0).astype(jnp.float32)
                    + (l1 < 2.0).astype(jnp.float32)
                    + (l1 < 4.0).astype(jnp.float32))
    dims = (-1,) if per_residue else (-2, -1)
    return (eps + jnp.sum(scored * score, axis=dims)) / (
        eps + jnp.sum(scored, axis=dims))


def lddt_loss(logits: jnp.ndarray, pred_atom37: jnp.ndarray,
              gt_atom37: jnp.ndarray, atom37_mask: jnp.ndarray,
              resolution: jnp.ndarray, cutoff: float = 15.0,
              no_bins: int = 50, min_resolution: float = 0.1,
              max_resolution: float = 3.0, eps: float = 1e-10) -> jnp.ndarray:
    """CA-lDDT confidence-head cross-entropy (reference lddt_loss,
    loss.py:463-513): bin the (stop-gradient) true lDDT, CE against logits,
    resolution-gated."""
    ca = 1  # atom37 CA index
    score = lddt(pred_atom37[..., ca, :], gt_atom37[..., ca, :],
                 atom37_mask[..., ca:ca + 1], cutoff=cutoff, eps=eps)
    score = jax.lax.stop_gradient(score)
    bins = jnp.clip((score * no_bins).astype(jnp.int32), 0, no_bins - 1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    errors = -jnp.take_along_axis(logp, bins[..., None], axis=-1)[..., 0]
    m = atom37_mask[..., ca]
    loss = jnp.sum(errors * m, -1) / (eps + jnp.sum(m, -1))
    gate = ((resolution >= min_resolution)
            & (resolution <= max_resolution)).astype(loss.dtype)
    return jnp.mean(loss * gate)


def _bin_centers(max_bin: float, no_bins: int) -> jnp.ndarray:
    boundaries = jnp.linspace(0.0, max_bin, no_bins - 1)
    step = boundaries[1] - boundaries[0]
    centers = boundaries + step / 2
    return jnp.concatenate([centers, centers[-1:] + step])


def compute_predicted_aligned_error(logits: jnp.ndarray, max_bin: float = 31,
                                    no_bins: int = 64) -> Dict[str, jnp.ndarray]:
    """Expected aligned error per residue pair from PAE-head logits
    (reference compute_predicted_aligned_error, loss.py:584-625)."""
    centers = _bin_centers(max_bin, no_bins)
    probs = jnp.exp(logits - jnp.max(logits, -1, keepdims=True))
    probs = probs / jnp.sum(probs, -1, keepdims=True)
    return {
        "aligned_confidence_probs": probs,
        "predicted_aligned_error": jnp.sum(probs * centers, axis=-1),
        "max_predicted_aligned_error": centers[-1],
    }


def compute_tm(logits: jnp.ndarray,
               residue_weights: Optional[jnp.ndarray] = None,
               max_bin: float = 31, no_bins: int = 64,
               eps: float = 1e-8) -> jnp.ndarray:
    """Predicted TM-score from PAE-head logits (reference compute_tm,
    loss.py:628-662)."""
    n = logits.shape[-2]
    if residue_weights is None:
        residue_weights = jnp.ones((n,), logits.dtype)
    centers = _bin_centers(max_bin, no_bins)
    d0 = 1.24 * (max(n, 19) - 15) ** (1.0 / 3) - 1.8
    probs = jnp.exp(logits - jnp.max(logits, -1, keepdims=True))
    probs = probs / jnp.sum(probs, -1, keepdims=True)
    tm_per_bin = 1.0 / (1.0 + (centers ** 2) / (d0 ** 2))
    predicted_tm = jnp.sum(probs * tm_per_bin, axis=-1)  # (..., n, n)
    normed = residue_weights / (eps + jnp.sum(residue_weights))
    per_alignment = jnp.sum(predicted_tm * normed, axis=-1)
    weighted = per_alignment * residue_weights
    return per_alignment[..., jnp.argmax(weighted, axis=-1)]


def tm_loss(logits: jnp.ndarray, pred_rigids: Rigid, gt_rigids: Rigid,
            mask: jnp.ndarray, resolution: jnp.ndarray,
            max_bin: float = 31, no_bins: int = 64,
            min_resolution: float = 0.1, max_resolution: float = 3.0,
            eps: float = 1e-8) -> jnp.ndarray:
    """PAE-head cross-entropy against (stop-gradient) frame-aligned squared
    errors (reference tm_loss, loss.py:665-712)."""
    def points(r: Rigid):
        return r.invert().expand_dims(-1).apply(r.trans[..., None, :, :])

    sq = jnp.sum((points(pred_rigids) - points(gt_rigids)) ** 2, axis=-1)
    sq = jax.lax.stop_gradient(sq)
    boundaries = jnp.linspace(0.0, max_bin, no_bins - 1) ** 2
    true_bins = jnp.sum(sq[..., None] > boundaries, axis=-1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    errors = -jnp.take_along_axis(logp, true_bins[..., None], axis=-1)[..., 0]
    square_mask = mask[..., None] * mask[..., None, :]
    scale = 0.5  # matches the reference's fp16 stabilization
    loss = jnp.sum(errors * square_mask, axis=-1)
    loss = loss / (eps + jnp.sum(scale * square_mask, axis=(-1, -2)))[..., None]
    loss = jnp.sum(loss, axis=-1) * scale
    gate = ((resolution >= min_resolution)
            & (resolution <= max_resolution)).astype(loss.dtype)
    return jnp.mean(loss * gate)


def atom14_dists_bounds(overlap_tolerance: float = 1.5):
    """Per-restype within-residue distance bounds on atom14 (vdW clash
    bounds; reference residue_constants.make_atom14_dists_bounds:855 —
    its literature bond/angle tightening reads stereo_chemical_props.txt,
    which is absent from the reference checkout too, so only the vdW part
    is reproducible). Returns (lower, upper) of shape (21, 14, 14)."""
    lower = np.zeros((ch.restype_num + 1, 14, 14), np.float32)
    upper = np.full((ch.restype_num + 1, 14, 14), 1e10, np.float32)
    for ri, one in enumerate(ch.restypes):
        names = ch.restype_name_to_atom14_names[ch.restype_1to3[one]]
        radii = [ch.van_der_waals_radius[nm[0]] if nm else 0.0 for nm in names]
        for i, nm_i in enumerate(names):
            if not nm_i:
                continue
            for j, nm_j in enumerate(names):
                if not nm_j or i == j:
                    continue
                lower[ri, i, j] = radii[i] + radii[j] - overlap_tolerance
    return lower, upper


def within_residue_violations(atom14_pred: jnp.ndarray,
                              atom14_exists: jnp.ndarray,
                              dists_lower_bound: jnp.ndarray,
                              dists_upper_bound: jnp.ndarray,
                              tighten_bounds_for_loss: float = 0.0,
                              eps: float = 1e-10) -> Dict[str, jnp.ndarray]:
    """Steric violations of non-bonded atoms within each residue
    (reference within_residue_violations, loss.py:1020-1106).
    bounds are (..., N, 14, 14) — gather from `atom14_dists_bounds` tables
    by aatype before calling."""
    masks = (1.0 - jnp.eye(14)) * (atom14_exists[..., :, :, None]
                                   * atom14_exists[..., :, None, :])
    dists = jnp.sqrt(eps + jnp.sum(
        (atom14_pred[..., :, :, None, :]
         - atom14_pred[..., :, None, :, :]) ** 2, axis=-1))
    low_err = jnp.maximum(
        dists_lower_bound + tighten_bounds_for_loss - dists, 0.0)
    high_err = jnp.maximum(
        dists - (dists_upper_bound - tighten_bounds_for_loss), 0.0)
    loss = masks * (low_err + high_err)
    per_atom_loss_sum = jnp.sum(loss, axis=-2) + jnp.sum(loss, axis=-1)
    violations = masks * ((dists < dists_lower_bound)
                          | (dists > dists_upper_bound)).astype(masks.dtype)
    per_atom_violations = jnp.maximum(jnp.max(violations, axis=-2),
                                      jnp.max(violations, axis=-1))
    return {"per_atom_loss_sum": per_atom_loss_sum,
            "per_atom_violations": per_atom_violations}


def extreme_ca_ca_distance_violations(pred_atom_pos: jnp.ndarray,
                                      pred_atom_mask: jnp.ndarray,
                                      residue_index: jnp.ndarray,
                                      max_angstrom_tolerance: float = 1.5,
                                      eps: float = 1e-6) -> jnp.ndarray:
    """Fraction of consecutive CA-CA pairs stretched beyond the ideal
    distance + tolerance (reference loss.py:1237-1272; atom index 1 = CA in
    both atom14 and atom37)."""
    this_ca = pred_atom_pos[..., :-1, 1, :]
    next_ca = pred_atom_pos[..., 1:, 1, :]
    mask = (pred_atom_mask[..., :-1, 1] * pred_atom_mask[..., 1:, 1]
            * (residue_index[..., 1:] - residue_index[..., :-1] == 1))
    d = jnp.sqrt(eps + jnp.sum((this_ca - next_ca) ** 2, axis=-1))
    viol = ((d - ch.ca_ca) > max_angstrom_tolerance).astype(jnp.float32)
    return jnp.sum(viol * mask, -1) / (eps + jnp.sum(mask, -1))


def compute_renamed_ground_truth(atom14_gt: jnp.ndarray,
                                 atom14_alt_gt: jnp.ndarray,
                                 atom14_gt_exists: jnp.ndarray,
                                 atom14_alt_gt_exists: jnp.ndarray,
                                 atom14_is_ambiguous: jnp.ndarray,
                                 atom14_pred: jnp.ndarray,
                                 eps: float = 1e-10) -> Dict[str, jnp.ndarray]:
    """Per-residue choice between the ground truth and its 180deg-symmetric
    renaming, by which matches the prediction's ambiguous-to-unambiguous
    distances better (AF2 Alg. 26; reference loss.py:1355-1484)."""
    def cross_dists(pos):
        return jnp.sqrt(eps + jnp.sum(
            (pos[..., :, None, :, None, :]
             - pos[..., None, :, None, :, :]) ** 2, axis=-1))

    pred_d = cross_dists(atom14_pred)
    gt_d = cross_dists(atom14_gt)
    alt_d = cross_dists(atom14_alt_gt)

    err = jnp.sqrt(eps + (pred_d - gt_d) ** 2)
    alt_err = jnp.sqrt(eps + (pred_d - alt_d) ** 2)

    # ambiguous atoms of residue i against unambiguous atoms of residue j
    mask = (atom14_gt_exists[..., :, None, :, None]
            * atom14_is_ambiguous[..., :, None, :, None]
            * atom14_gt_exists[..., None, :, None, :]
            * (1.0 - atom14_is_ambiguous[..., None, :, None, :]))
    per_res = jnp.sum(mask * err, axis=(-1, -2, -3))
    alt_per_res = jnp.sum(mask * alt_err, axis=(-1, -2, -3))
    alt_better = (alt_per_res < per_res).astype(atom14_pred.dtype)

    sel = alt_better[..., None, None]
    return {
        "alt_naming_is_better": alt_better,
        "renamed_atom14_gt_positions":
            (1.0 - sel) * atom14_gt + sel * atom14_alt_gt,
        "renamed_atom14_gt_exists":
            (1.0 - sel[..., 0]) * atom14_gt_exists
            + sel[..., 0] * atom14_alt_gt_exists,
    }


def compute_drmsd(structure_1: jnp.ndarray, structure_2: jnp.ndarray,
                  mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Distance-matrix RMSD between two point sets (reference compute_drmsd,
    loss.py:1520-1542)."""
    if mask is not None:
        structure_1 = structure_1 * mask[..., None]
        structure_2 = structure_2 * mask[..., None]
    d1 = jnp.sqrt(jnp.sum(
        (structure_1[..., :, None, :] - structure_1[..., None, :, :]) ** 2, -1))
    d2 = jnp.sqrt(jnp.sum(
        (structure_2[..., :, None, :] - structure_2[..., None, :, :]) ** 2, -1))
    drmsd = jnp.sum((d1 - d2) ** 2, axis=(-1, -2))
    n = d1.shape[-1] if mask is None else jnp.sum(mask, axis=-1)
    drmsd = jnp.where(n > 1, drmsd / (n * (n - 1)), 0.0)
    return jnp.sqrt(drmsd)
