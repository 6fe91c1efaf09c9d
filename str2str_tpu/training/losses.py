"""Denoising score-matching loss with auxiliary coordinate losses.

Exact-semantics rebuild of the reference ScoreMatchingLoss
(`/root/reference/src/models/loss.py:1629-1741` plus `backbone_atom_loss`
:1553 and `pairwise_distance_loss` :1581): translation score loss switched to
x0-MSE below a t threshold, rotation score loss, t-gated backbone-atom MSE
and local pairwise-distance MSE, per-term non-finite guards.

All terms are pure jnp; `out`/`batch` carry (quat, trans) FrameStates instead
of Rigid objects.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Tuple

import jax.numpy as jnp

from ..geometry.frames import compute_backbone
from ..geometry.rigid import Rigid


@dataclass(frozen=True)
class LossConfig:
    trans_weight: float = 1.0
    trans_coordinate_scaling: float = 0.1
    trans_x0_threshold: float = 1.0
    rot_weight: float = 1.0
    backbone_enabled: bool = True
    backbone_weight: float = 0.25
    backbone_t_threshold: float = 0.25
    pwd_enabled: bool = True
    pwd_weight: float = 0.25
    pwd_t_threshold: float = 0.25
    pwd_dist_threshold: float = 6.0
    fape_enabled: bool = False
    fape_weight: float = 0.5
    fape_clamp_distance: float = 10.0
    fape_t_threshold: float = 0.25
    # Reference config-gated extras, default-disabled (reference
    # loss.py:1674-1701 + configs/model/diffusion.yaml:64-78). Each requires
    # the matching head outputs in `out` — same contract as the reference
    # (it KeyErrors on the missing logits too).
    distogram_enabled: bool = False
    distogram_weight: float = 1.0
    supervised_chi_enabled: bool = False
    supervised_chi_weight: float = 1.0
    lddt_enabled: bool = False
    lddt_weight: float = 1.0
    tm_enabled: bool = False
    tm_weight: float = 1.0
    eps: float = 1e-6


def _guard(x: jnp.ndarray) -> jnp.ndarray:
    """Zero out non-finite loss terms (reference loss.py:1722-1724)."""
    return jnp.where(jnp.isfinite(x), x, jnp.zeros_like(x))


def score_matching_loss(out: Dict[str, jnp.ndarray],
                        batch: Dict[str, jnp.ndarray],
                        cfg: LossConfig = LossConfig()) -> Tuple[jnp.ndarray, Dict]:
    """
    out: network + rescoring outputs — trans (B,L,3), atom37 (B,L,37,3),
         rot_score / trans_score (predicted scores at x_t).
    batch: features + forward-marginal outputs — rot_score / trans_score
         (ground-truth scores), *_score_scaling (B,), t (B,), seq_mask,
         fixed_mask, gt_trans_0 (B,L,3), torsion_angles_sin_cos, aatype,
         rigidgroups_gt_frames.
    Returns (total_loss, breakdown).
    """
    seq_mask = batch["seq_mask"].astype(jnp.float32)
    diffuse_mask = 1.0 - batch["fixed_mask"].astype(jnp.float32)
    loss_mask = seq_mask * diffuse_mask                      # (B, L)
    denom = jnp.sum(loss_mask, axis=-1) + cfg.eps            # (B,)
    t = batch["t"]

    dm = diffuse_mask[..., None]
    pred_rot_score = out["rot_score"] * dm
    pred_trans_score = out["trans_score"] * dm
    gt_rot_score = batch["rot_score"] * dm
    gt_trans_score = batch["trans_score"] * dm

    # Translation score-matching, normalized by the score scaling.
    ts = (gt_trans_score - pred_trans_score) * loss_mask[..., None]
    ts = ts / batch["trans_score_scaling"][:, None, None]
    trans_score_loss = jnp.sum(ts**2, axis=(-1, -2)) / denom

    # Alternative x0 loss (active below the t threshold).
    tx = (cfg.trans_coordinate_scaling
          * (batch["gt_trans_0"] - out["trans"]) * loss_mask[..., None])
    trans_x0_loss = jnp.sum(tx**2, axis=(-1, -2)) / denom
    trans_loss = jnp.mean(
        trans_score_loss * (t > cfg.trans_x0_threshold)
        + trans_x0_loss * (t <= cfg.trans_x0_threshold))

    # Rotation score-matching.
    rs = (gt_rot_score - pred_rot_score) * loss_mask[..., None]
    rs = rs / batch["rot_score_scaling"][:, None, None]
    rot_loss = jnp.mean(jnp.sum(rs**2, axis=(-1, -2)) / denom)

    losses = {"translation": _guard(trans_loss), "rotation": _guard(rot_loss)}
    total = cfg.trans_weight * losses["translation"] + cfg.rot_weight * losses["rotation"]

    need_gt_atoms = (cfg.backbone_enabled or cfg.pwd_enabled
                     or cfg.fape_enabled or cfg.lddt_enabled)
    if need_gt_atoms or cfg.tm_enabled:
        gt_rigids = Rigid.from_tensor_4x4(
            batch["rigidgroups_gt_frames"][..., 0, :, :].astype(jnp.float32))
        gt_psi = batch["torsion_angles_sin_cos"][..., 2, :].astype(jnp.float32)
        gt_atom37, gt_atom37_mask, _ = compute_backbone(
            gt_rigids, gt_psi, batch["aatype"])

    if cfg.backbone_enabled:
        pred_bb = out["atom37"][:, :, :5]
        gt_bb = gt_atom37[:, :, :5]
        bb_mask = gt_atom37_mask[:, :, :5].astype(jnp.float32) * loss_mask[..., None]
        bb_loss = jnp.sum((pred_bb - gt_bb)**2 * bb_mask[..., None],
                          axis=(-1, -2, -3)) / (jnp.sum(bb_mask, axis=(-1, -2)) + 1e-4)
        bb_loss = bb_loss * (t < cfg.backbone_t_threshold)
        losses["backbone"] = _guard(jnp.mean(bb_loss))
        total = total + cfg.backbone_weight * losses["backbone"]

    if cfg.pwd_enabled:
        B, L = loss_mask.shape
        pred_flat = out["atom37"][:, :, :5].reshape(B, L * 5, 3)
        gt_flat = gt_atom37[:, :, :5].reshape(B, L * 5, 3)
        res_mask = (seq_mask * loss_mask).reshape(B, L, 1)
        atom_mask = jnp.tile(res_mask, (1, 1, 5)).reshape(B, L * 5)

        # Gradient-safe pairwise norms: the diagonal self-distances are exact
        # zeros, where jnp.linalg.norm's gradient is NaN (torch, which the
        # reference uses, defines a zero subgradient there instead).
        def safe_pwd(x):
            d2 = jnp.sum((x[:, :, None, :] - x[:, None, :, :]) ** 2, axis=-1)
            return jnp.sqrt(d2 + 1e-20)

        gt_pwd = safe_pwd(gt_flat) * atom_mask[..., None]
        pred_pwd = safe_pwd(pred_flat) * atom_mask[..., None]

        pair_mask = atom_mask[:, :, None] * atom_mask[:, None, :]
        pair_mask = pair_mask * (pred_pwd < cfg.pwd_dist_threshold)
        pwd_loss = jnp.sum((gt_pwd - pred_pwd)**2 * pair_mask, axis=(-1, -2)) / (
            jnp.sum(pair_mask, axis=(-1, -2)) - L + 1e-4)
        pwd_loss = pwd_loss * (t < cfg.pwd_t_threshold)
        losses["pwd"] = _guard(jnp.mean(pwd_loss))
        total = total + cfg.pwd_weight * losses["pwd"]

    if cfg.fape_enabled:
        from .aux_losses import compute_fape
        pred_rigids = Rigid.from_quat_trans(
            out["quat"].astype(jnp.float32), out["trans"].astype(jnp.float32))
        fape = compute_fape(
            pred_rigids, gt_rigids, loss_mask,
            pred_rigids.trans, gt_rigids.trans, loss_mask,
            length_scale=10.0, l1_clamp_distance=cfg.fape_clamp_distance)
        fape = fape * (t < cfg.fape_t_threshold)
        losses["fape"] = _guard(jnp.mean(fape))
        total = total + cfg.fape_weight * losses["fape"]

    if cfg.distogram_enabled:
        # Reference loss.py:1674-1679: requires a distogram head
        # (out["distogram_logits"]) and pseudo-beta features.
        from .aux_losses import distogram_loss
        losses["distogram"] = _guard(distogram_loss(
            out["distogram_logits"], batch["pseudo_beta"],
            batch["pseudo_beta_mask"]))
        total = total + cfg.distogram_weight * losses["distogram"]

    if cfg.supervised_chi_enabled:
        # Reference loss.py:1680-1685 (psi-only in this model): requires the
        # torsion head's normalized + unnormalized angles in `out`.
        from .aux_losses import supervised_torsion_loss
        gt_sc = batch["torsion_angles_sin_cos"][..., 2:3, :]
        losses["supervised_chi"] = _guard(supervised_torsion_loss(
            out["sm_angles"], out["sm_unnormalized_angles"],
            gt_sc, -gt_sc, loss_mask[..., None]))
        total = total + cfg.supervised_chi_weight * losses["supervised_chi"]

    if cfg.lddt_enabled:
        # Reference loss.py:1686-1691: requires an lddt confidence head.
        from .aux_losses import lddt_loss
        losses["lddt"] = _guard(lddt_loss(
            out["lddt_logits"], out["atom37"], gt_atom37,
            gt_atom37_mask.astype(jnp.float32) * loss_mask[..., None],
            resolution=batch.get("resolution", jnp.ones_like(t))))
        total = total + cfg.lddt_weight * losses["lddt"]

    if cfg.tm_enabled:
        # Reference loss.py:1692-1697: requires a PAE head.
        from .aux_losses import tm_loss
        pred_rigids = Rigid.from_quat_trans(
            out["quat"].astype(jnp.float32), out["trans"].astype(jnp.float32))
        losses["tm"] = _guard(tm_loss(
            out["tm_logits"], pred_rigids, gt_rigids, loss_mask,
            resolution=batch.get("resolution", jnp.ones_like(t))))
        total = total + cfg.tm_weight * losses["tm"]

    losses["loss"] = total
    return total, losses


def loss_config_from(cfg) -> LossConfig:
    """Build LossConfig from the structured model.loss config node."""
    l = cfg.model.loss
    return LossConfig(
        trans_weight=l.translation.weight,
        trans_coordinate_scaling=l.translation.coordinate_scaling,
        trans_x0_threshold=l.translation.x0_threshold,
        rot_weight=l.rotation.weight,
        backbone_enabled=l.backbone.enabled,
        backbone_weight=l.backbone.get("weight", 0.25),
        backbone_t_threshold=l.backbone.get("t_threshold", 0.25),
        pwd_enabled=l.pwd.enabled,
        pwd_weight=l.pwd.get("weight", 0.25),
        pwd_t_threshold=l.pwd.get("t_threshold", 0.25),
        pwd_dist_threshold=l.pwd.get("dist_threshold", 6.0),
        fape_enabled=l.get("fape", {}).get("enabled", False),
        fape_weight=l.get("fape", {}).get("weight", 0.5),
        fape_clamp_distance=l.get("fape", {}).get("clamp_distance", 10.0),
        fape_t_threshold=l.get("fape", {}).get("t_threshold", 0.25),
        distogram_enabled=l.get("distogram", {}).get("enabled", False),
        distogram_weight=l.get("distogram", {}).get("weight", 1.0),
        supervised_chi_enabled=l.get("supervised_chi", {}).get("enabled", False),
        supervised_chi_weight=l.get("supervised_chi", {}).get("weight", 1.0),
        lddt_enabled=l.get("lddt", {}).get("enabled", False),
        lddt_weight=l.get("lddt", {}).get("weight", 1.0),
        tm_enabled=l.get("tm", {}).get("enabled", False),
        tm_weight=l.get("tm", {}).get("weight", 1.0),
        eps=l.eps,
    )
