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


def backbone_loss(backbone_rigid_tensor: jnp.ndarray,
                  backbone_rigid_mask: jnp.ndarray,
                  traj: jnp.ndarray,
                  use_clamped_fape: Optional[jnp.ndarray] = None,
                  clamp_distance: float = 10.0,
                  loss_unit_distance: float = 10.0,
                  eps: float = 1e-4) -> jnp.ndarray:
    """Backbone FAPE over a TRAJECTORY of predicted frames (reference
    backbone_loss, loss.py:154-211): traj is (T, *, N, 7) tensor_7 frames
    (one entry per trunk block / recycling iteration), ground truth a
    (*, N, 4, 4) tensor; returns the per-traj-entry FAPE averaged over
    batch, shape (T,)."""
    gt = Rigid.from_tensor_4x4(backbone_rigid_tensor)

    def one(traj_t):
        pred = Rigid.from_tensor_7(traj_t)
        fape = compute_fape(
            pred, gt, backbone_rigid_mask,
            pred.trans, gt.trans, backbone_rigid_mask,
            length_scale=loss_unit_distance,
            l1_clamp_distance=clamp_distance, eps=eps)
        if use_clamped_fape is not None:
            unclamped = compute_fape(
                pred, gt, backbone_rigid_mask,
                pred.trans, gt.trans, backbone_rigid_mask,
                length_scale=loss_unit_distance,
                l1_clamp_distance=None, eps=eps)
            return jnp.mean(fape * use_clamped_fape
                            + unclamped * (1.0 - use_clamped_fape))
        return jnp.mean(fape)

    return jax.vmap(one)(traj)


def sidechain_loss(sidechain_frames: jnp.ndarray,
                   sidechain_atom_pos: jnp.ndarray,
                   rigidgroups_gt_frames: jnp.ndarray,
                   rigidgroups_alt_gt_frames: jnp.ndarray,
                   rigidgroups_gt_exists: jnp.ndarray,
                   renamed_atom14_gt_positions: jnp.ndarray,
                   renamed_atom14_gt_exists: jnp.ndarray,
                   alt_naming_is_better: jnp.ndarray,
                   clamp_distance: float = 10.0,
                   length_scale: float = 10.0,
                   eps: float = 1e-4) -> jnp.ndarray:
    """All-atom FAPE of the FINAL trajectory entry's sidechain frames/atoms
    against the renamed (180deg-ambiguity-resolved) ground truth (reference
    sidechain_loss, loss.py:212-261): frames (T, *, N, 8, 4, 4), positions
    (T, *, N, 14, 3); flattens rigid groups and atoms into single axes."""
    sel = alt_naming_is_better[..., None, None, None]
    renamed_gt_frames = ((1.0 - sel) * rigidgroups_gt_frames
                         + sel * rigidgroups_alt_gt_frames)

    sidechain_frames = sidechain_frames[-1]
    batch_dims = sidechain_frames.shape[:-4]
    frames = Rigid.from_tensor_4x4(
        sidechain_frames.reshape(batch_dims + (-1, 4, 4)))
    gt_frames = Rigid.from_tensor_4x4(
        renamed_gt_frames.reshape(batch_dims + (-1, 4, 4)))
    frames_mask = rigidgroups_gt_exists.reshape(batch_dims + (-1,))
    pos = sidechain_atom_pos[-1].reshape(batch_dims + (-1, 3))
    gt_pos = renamed_atom14_gt_positions.reshape(batch_dims + (-1, 3))
    pos_mask = renamed_atom14_gt_exists.reshape(batch_dims + (-1,))

    return compute_fape(frames, gt_frames, frames_mask,
                        pos, gt_pos, pos_mask,
                        length_scale=length_scale,
                        l1_clamp_distance=clamp_distance, eps=eps)


def fape_loss(out: Dict[str, jnp.ndarray], batch: Dict[str, jnp.ndarray],
              backbone_weight: float = 0.5, sidechain_weight: float = 0.5,
              backbone_clamp_distance: float = 10.0,
              backbone_loss_unit_distance: float = 10.0,
              sidechain_clamp_distance: float = 10.0,
              sidechain_length_scale: float = 10.0) -> jnp.ndarray:
    """Combined backbone + sidechain FAPE (reference fape_loss,
    loss.py:262-284). out carries the structure-module trajectory under
    "sm": frames (T,*,N,7), sidechain_frames (T,*,N,8,4,4), positions
    (T,*,N,14,3); batch carries the GT frames/renaming features
    (atom37_to_frames + compute_renamed_ground_truth outputs)."""
    bb = backbone_loss(
        backbone_rigid_tensor=batch["backbone_rigid_tensor"],
        backbone_rigid_mask=batch["backbone_rigid_mask"],
        traj=out["sm"]["frames"],
        use_clamped_fape=batch.get("use_clamped_fape"),
        clamp_distance=backbone_clamp_distance,
        loss_unit_distance=backbone_loss_unit_distance)
    sc = sidechain_loss(
        out["sm"]["sidechain_frames"], out["sm"]["positions"],
        rigidgroups_gt_frames=batch["rigidgroups_gt_frames"],
        rigidgroups_alt_gt_frames=batch["rigidgroups_alt_gt_frames"],
        rigidgroups_gt_exists=batch["rigidgroups_gt_exists"],
        renamed_atom14_gt_positions=batch["renamed_atom14_gt_positions"],
        renamed_atom14_gt_exists=batch["renamed_atom14_gt_exists"],
        alt_naming_is_better=batch["alt_naming_is_better"],
        clamp_distance=sidechain_clamp_distance,
        length_scale=sidechain_length_scale)
    return jnp.mean(backbone_weight * jnp.mean(bb) + sidechain_weight * sc)


def experimentally_resolved_loss(logits: jnp.ndarray,
                                 atom37_atom_exists: jnp.ndarray,
                                 all_atom_mask: jnp.ndarray,
                                 resolution: jnp.ndarray,
                                 min_resolution: float = 0.1,
                                 max_resolution: float = 3.0,
                                 eps: float = 1e-8) -> jnp.ndarray:
    """Sigmoid cross-entropy of a per-atom resolved head against the
    experimental atom mask, resolution-gated (reference loss.py:1463-1485)."""
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    errors = -all_atom_mask * log_p - (1.0 - all_atom_mask) * log_not_p
    loss = jnp.sum(errors * atom37_atom_exists, axis=-1)
    loss = loss / (eps + jnp.sum(atom37_atom_exists, axis=(-1, -2))[..., None])
    loss = jnp.sum(loss, axis=-1)
    gate = ((resolution >= min_resolution)
            & (resolution <= max_resolution)).astype(loss.dtype)
    return jnp.mean(loss * gate)


def masked_msa_loss(logits: jnp.ndarray, true_msa: jnp.ndarray,
                    bert_mask: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """BERT-style masked-MSA cross-entropy (AF2 Suppl. 1.9.9; reference
    loss.py:1487-1517 including its fp16-friendly 0.5-scaled averaging).
    logits (*, S, N, 23), true_msa (*, S, N) int, bert_mask (*, S, N)."""
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    errors = -jnp.take_along_axis(
        log_probs, true_msa[..., None].astype(jnp.int32), axis=-1)[..., 0]
    loss = jnp.sum(errors * bert_mask, axis=-1)
    scale = 0.5
    denom = eps + jnp.sum(scale * bert_mask, axis=(-1, -2))
    loss = loss / denom[..., None]
    loss = jnp.sum(loss, axis=-1) * scale
    return jnp.mean(loss)


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


def _pad_last(x: jnp.ndarray, left: int, right: int) -> jnp.ndarray:
    pads = [(0, 0)] * (x.ndim - 1) + [(left, right)]
    return jnp.pad(x, pads)


def between_residue_bond_loss(pred_atom_pos: jnp.ndarray,
                              pred_atom_mask: jnp.ndarray,
                              residue_index: jnp.ndarray,
                              aatype: jnp.ndarray,
                              tolerance_factor_soft: float = 12.0,
                              tolerance_factor_hard: float = 12.0,
                              eps: float = 1e-6) -> Dict[str, jnp.ndarray]:
    """Flat-bottom C-N peptide bond length/angle violations between
    consecutive residues (AF2 Suppl. 1.9.11 eq 44-45; reference
    loss.py:714-869, exact key-set and error forms; atom14/atom37 layout:
    N=0, CA=1, C=2)."""
    this_ca = pred_atom_pos[..., :-1, 1, :]
    this_ca_mask = pred_atom_mask[..., :-1, 1]
    this_c = pred_atom_pos[..., :-1, 2, :]
    this_c_mask = pred_atom_mask[..., :-1, 2]
    next_n = pred_atom_pos[..., 1:, 0, :]
    next_n_mask = pred_atom_mask[..., 1:, 0]
    next_ca = pred_atom_pos[..., 1:, 1, :]
    next_ca_mask = pred_atom_mask[..., 1:, 1]
    has_no_gap = (residue_index[..., 1:] - residue_index[..., :-1] == 1.0
                  ).astype(jnp.float32)

    # C--N bond length (proline's ring shifts it; reference loss.py:769).
    c_n = jnp.sqrt(eps + jnp.sum((this_c - next_n) ** 2, -1))
    next_is_pro = (aatype[..., 1:] == ch.restype_order["P"]).astype(jnp.float32)
    gt_len = ((1.0 - next_is_pro) * ch.between_res_bond_length_c_n[0]
              + next_is_pro * ch.between_res_bond_length_c_n[1])
    gt_std = ((1.0 - next_is_pro) * ch.between_res_bond_length_stddev_c_n[0]
              + next_is_pro * ch.between_res_bond_length_stddev_c_n[1])
    c_n_err = jnp.sqrt(eps + (c_n - gt_len) ** 2)
    c_n_loss_per_res = jax.nn.relu(c_n_err - tolerance_factor_soft * gt_std)
    mask = this_c_mask * next_n_mask * has_no_gap
    c_n_loss = jnp.sum(mask * c_n_loss_per_res, -1) / (jnp.sum(mask, -1) + eps)
    c_n_viol = mask * (c_n_err > tolerance_factor_hard * gt_std)

    # Bond angles via unit vectors. c_ca points C->CA (reference
    # loss.py:803): the CA-C-N angle's cosine constant (-0.4473 at the
    # ideal 116.2 deg) is defined for vectors FROM the vertex atom C.
    ca_c_len = jnp.sqrt(eps + jnp.sum((this_ca - this_c) ** 2, -1))
    n_ca_len = jnp.sqrt(eps + jnp.sum((next_n - next_ca) ** 2, -1))
    c_ca = (this_ca - this_c) / ca_c_len[..., None]
    cn = (next_n - this_c) / c_n[..., None]
    n_ca = (next_ca - next_n) / n_ca_len[..., None]

    cos_ca_c_n = jnp.sum(c_ca * cn, -1)
    # NOTE: the reference uses the C-N bond-LENGTH stddev for this angle's
    # tolerance (loss.py:810, an OpenFold/AF2 quirk kept for parity).
    ang1_std = ch.between_res_bond_length_stddev_c_n[0]
    ang1_err = jnp.sqrt(eps + (cos_ca_c_n - ch.between_res_cos_angles_ca_c_n[0]) ** 2)
    ang1_loss_per_res = jax.nn.relu(ang1_err - tolerance_factor_soft * ang1_std)
    mask1 = this_ca_mask * this_c_mask * next_n_mask * has_no_gap
    ca_c_n_loss = jnp.sum(mask1 * ang1_loss_per_res, -1) / (jnp.sum(mask1, -1) + eps)
    ang1_viol = mask1 * (ang1_err > tolerance_factor_hard * ang1_std)

    cos_c_n_ca = jnp.sum(-cn * n_ca, -1)
    ang2_std = ch.between_res_cos_angles_c_n_ca[1]
    ang2_err = jnp.sqrt(eps + (cos_c_n_ca - ch.between_res_cos_angles_c_n_ca[0]) ** 2)
    ang2_loss_per_res = jax.nn.relu(ang2_err - tolerance_factor_soft * ang2_std)
    mask2 = this_c_mask * next_n_mask * next_ca_mask * has_no_gap
    c_n_ca_loss = jnp.sum(mask2 * ang2_loss_per_res, -1) / (jnp.sum(mask2, -1) + eps)
    ang2_viol = mask2 * (ang2_err > tolerance_factor_hard * ang2_std)

    # Distribute each bond's loss to both flanking residues (loss.py:843).
    per_res = c_n_loss_per_res + ang1_loss_per_res + ang2_loss_per_res
    per_residue_loss_sum = 0.5 * (_pad_last(per_res, 0, 1)
                                  + _pad_last(per_res, 1, 0))
    viol = jnp.max(jnp.stack([c_n_viol, ang1_viol, ang2_viol], -2), -2)
    per_residue_violation_mask = jnp.maximum(_pad_last(viol, 0, 1),
                                             _pad_last(viol, 1, 0))
    return {
        "c_n_loss_mean": c_n_loss,
        "ca_c_n_loss_mean": ca_c_n_loss,
        "c_n_ca_loss_mean": c_n_ca_loss,
        "per_residue_loss_sum": per_residue_loss_sum,
        "per_residue_violation_mask": per_residue_violation_mask,
    }


def atom14_radius(aatype: jnp.ndarray,
                  atom14_exists: jnp.ndarray) -> jnp.ndarray:
    """Per-atom van-der-Waals radii on the atom14 layout (element = first
    letter of the atom name; reference loss.py:1128-1137)."""
    table = np.zeros((ch.restype_num + 1, 14), np.float32)
    for ri, one in enumerate(ch.restypes):
        names = ch.restype_name_to_atom14_names[ch.restype_1to3[one]]
        for ai, nm in enumerate(names):
            if nm:
                table[ri, ai] = ch.van_der_waals_radius[nm[0]]
    radius = jnp.take(jnp.asarray(table),
                      jnp.clip(aatype, 0, ch.restype_num), axis=0)
    return radius * atom14_exists


def between_residue_clash_loss(atom14_pred_positions: jnp.ndarray,
                               atom14_atom_exists: jnp.ndarray,
                               atom14_atom_radius: jnp.ndarray,
                               residue_index: jnp.ndarray,
                               overlap_tolerance_soft: float = 1.5,
                               overlap_tolerance_hard: float = 1.5,
                               eps: float = 1e-10) -> Dict[str, jnp.ndarray]:
    """Steric clashes of non-bonded atoms in DIFFERENT residues (AF2 Suppl.
    1.9.11 eq 46; reference loss.py:873-1017, exact key-set and masking:
    upper-triangular residue pairs, bonded C-N neighbors and CYS-SG
    disulfides excluded)."""
    fp = atom14_pred_positions.dtype
    dists = jnp.sqrt(eps + jnp.sum(
        (atom14_pred_positions[..., :, None, :, None, :]
         - atom14_pred_positions[..., None, :, None, :, :]) ** 2, -1))

    dists_mask = (atom14_atom_exists[..., :, None, :, None]
                  * atom14_atom_exists[..., None, :, None, :]).astype(fp)
    dists_mask = dists_mask * (
        residue_index[..., :, None, None, None]
        < residue_index[..., None, :, None, None])

    c_one_hot = jax.nn.one_hot(2, 14, dtype=fp)
    n_one_hot = jax.nn.one_hot(0, 14, dtype=fp)
    neighbour = (residue_index[..., :, None, None, None] + 1
                 == residue_index[..., None, :, None, None])
    c_n_bonds = (neighbour * c_one_hot[..., :, None]
                 * n_one_hot[..., None, :])
    dists_mask = dists_mask * (1.0 - c_n_bonds)

    cys_sg_idx = ch.restype_name_to_atom14_names["CYS"].index("SG")
    sg_one_hot = jax.nn.one_hot(cys_sg_idx, 14, dtype=fp)
    disulfide = sg_one_hot[..., :, None] * sg_one_hot[..., None, :]
    dists_mask = dists_mask * (1.0 - disulfide)

    dists_lower_bound = dists_mask * (
        atom14_atom_radius[..., :, None, :, None]
        + atom14_atom_radius[..., None, :, None, :])
    dists_to_low_error = dists_mask * jax.nn.relu(
        dists_lower_bound - overlap_tolerance_soft - dists)

    # Global scalar, NOT per-batch: the reference reduces over every dim
    # including batch (loss.py:992 `torch.sum(dists_to_low_error) /
    # (1e-6 + torch.sum(dists_mask))`).
    mean_loss = (jnp.sum(dists_to_low_error)
                 / (1e-6 + jnp.sum(dists_mask)))
    per_atom_loss_sum = (jnp.sum(dists_to_low_error, axis=(-4, -2))
                         + jnp.sum(dists_to_low_error, axis=(-3, -1)))
    clash_mask = dists_mask * (
        dists < (dists_lower_bound - overlap_tolerance_hard))
    per_atom_clash_mask = jnp.maximum(jnp.max(clash_mask, axis=(-4, -2)),
                                      jnp.max(clash_mask, axis=(-3, -1)))
    return {
        "mean_loss": mean_loss,
        "per_atom_loss_sum": per_atom_loss_sum,
        "per_atom_clash_mask": per_atom_clash_mask,
    }


def find_structural_violations(batch: Dict[str, jnp.ndarray],
                               atom14_pred_positions: jnp.ndarray,
                               violation_tolerance_factor: float = 12.0,
                               clash_overlap_tolerance: float = 1.5
                               ) -> Dict[str, Dict[str, jnp.ndarray]]:
    """All structural-violation checks combined (reference
    loss.py:1107-1219, same nested output schema). batch needs
    atom14_atom_exists, residue_index, aatype (make_atom14_masks provides
    the first). Within-residue bounds are the vdW-only tables
    (atom14_dists_bounds): the reference's literature bond/angle tightening
    reads stereo_chemical_props.txt, which is absent from its checkout too
    — its own find_structural_violations cannot run there."""
    connection = between_residue_bond_loss(
        pred_atom_pos=atom14_pred_positions,
        pred_atom_mask=batch["atom14_atom_exists"],
        residue_index=batch["residue_index"],
        aatype=batch["aatype"],
        tolerance_factor_soft=violation_tolerance_factor,
        tolerance_factor_hard=violation_tolerance_factor)

    radius = atom14_radius(batch["aatype"], batch["atom14_atom_exists"])
    clashes = between_residue_clash_loss(
        atom14_pred_positions=atom14_pred_positions,
        atom14_atom_exists=batch["atom14_atom_exists"],
        atom14_atom_radius=radius,
        residue_index=batch["residue_index"],
        overlap_tolerance_soft=clash_overlap_tolerance,
        overlap_tolerance_hard=clash_overlap_tolerance)

    lower, upper = atom14_dists_bounds(overlap_tolerance=clash_overlap_tolerance)
    aat = jnp.clip(batch["aatype"], 0, ch.restype_num)
    residue_viol = within_residue_violations(
        atom14_pred=atom14_pred_positions,
        atom14_exists=batch["atom14_atom_exists"],
        dists_lower_bound=jnp.take(jnp.asarray(lower), aat, axis=0),
        dists_upper_bound=jnp.take(jnp.asarray(upper), aat, axis=0),
        tighten_bounds_for_loss=0.0)

    per_residue_violations_mask = jnp.max(jnp.stack([
        connection["per_residue_violation_mask"],
        jnp.max(clashes["per_atom_clash_mask"], axis=-1),
        jnp.max(residue_viol["per_atom_violations"], axis=-1)], axis=-1),
        axis=-1)
    return {
        "between_residues": {
            "bonds_c_n_loss_mean": connection["c_n_loss_mean"],
            "angles_ca_c_n_loss_mean": connection["ca_c_n_loss_mean"],
            "angles_c_n_ca_loss_mean": connection["c_n_ca_loss_mean"],
            "connections_per_residue_loss_sum":
                connection["per_residue_loss_sum"],
            "connections_per_residue_violation_mask":
                connection["per_residue_violation_mask"],
            "clashes_mean_loss": clashes["mean_loss"],
            "clashes_per_atom_loss_sum": clashes["per_atom_loss_sum"],
            "clashes_per_atom_clash_mask": clashes["per_atom_clash_mask"],
        },
        "within_residues": {
            "per_atom_loss_sum": residue_viol["per_atom_loss_sum"],
            "per_atom_violations": residue_viol["per_atom_violations"],
        },
        "total_per_residue_violations_mask": per_residue_violations_mask,
    }


def violation_loss(violations: Dict[str, Dict[str, jnp.ndarray]],
                   atom14_atom_exists: jnp.ndarray,
                   eps: float = 1e-6) -> jnp.ndarray:
    """Aggregate violation loss (reference loss.py:1333-1352): the three
    bond/angle means plus total clash loss normalized by atom count."""
    num_atoms = jnp.sum(atom14_atom_exists)
    l_clash = jnp.sum(
        violations["between_residues"]["clashes_per_atom_loss_sum"]
        + violations["within_residues"]["per_atom_loss_sum"])
    l_clash = l_clash / (eps + num_atoms)
    return (violations["between_residues"]["bonds_c_n_loss_mean"]
            + violations["between_residues"]["angles_ca_c_n_loss_mean"]
            + violations["between_residues"]["angles_c_n_ca_loss_mean"]
            + l_clash)


def _masked_mean(mask: jnp.ndarray, value: jnp.ndarray,
                 axis: int = -1, eps: float = 1e-10) -> jnp.ndarray:
    return jnp.sum(mask * value, axis=axis) / (eps + jnp.sum(mask, axis=axis))


def compute_violation_metrics(batch: Dict[str, jnp.ndarray],
                              atom14_pred_positions: jnp.ndarray,
                              violations: Dict[str, Dict[str, jnp.ndarray]]
                              ) -> Dict[str, jnp.ndarray]:
    """Per-example violation summary metrics (reference loss.py:1274-1316,
    same keys)."""
    ret = {}
    ret["violations_extreme_ca_ca_distance"] = extreme_ca_ca_distance_violations(
        pred_atom_pos=atom14_pred_positions,
        pred_atom_mask=batch["atom14_atom_exists"],
        residue_index=batch["residue_index"])
    ret["violations_between_residue_bond"] = _masked_mean(
        batch["seq_mask"],
        violations["between_residues"]["connections_per_residue_violation_mask"])
    ret["violations_between_residue_clash"] = _masked_mean(
        batch["seq_mask"],
        jnp.max(violations["between_residues"]["clashes_per_atom_clash_mask"],
                axis=-1))
    ret["violations_within_residue"] = _masked_mean(
        batch["seq_mask"],
        jnp.max(violations["within_residues"]["per_atom_violations"], axis=-1))
    ret["violations_per_residue"] = _masked_mean(
        batch["seq_mask"], violations["total_per_residue_violations_mask"])
    return ret


def violation_metrics(pred_atom14: jnp.ndarray, atom14_mask: jnp.ndarray,
                      residue_index: jnp.ndarray, aatype: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Compact scalar violation summary (convenience wrapper over
    find_structural_violations + compute_violation_metrics)."""
    batch = {"atom14_atom_exists": atom14_mask,
             "residue_index": residue_index, "aatype": aatype,
             "seq_mask": jnp.ones(aatype.shape, jnp.float32)}
    v = find_structural_violations(batch, pred_atom14)
    m = compute_violation_metrics(batch, pred_atom14, v)
    return {
        "violations_between_residue_bond":
            jnp.mean(m["violations_between_residue_bond"]),
        "violations_between_residue_clash":
            jnp.mean(m["violations_between_residue_clash"]),
        "c_n_loss": jnp.mean(
            v["between_residues"]["bonds_c_n_loss_mean"]),
        "clash_loss": jnp.mean(
            v["between_residues"]["clashes_mean_loss"]),
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
