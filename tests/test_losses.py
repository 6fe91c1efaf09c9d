import jax
import jax.numpy as jnp
import numpy as np
import pytest

from str2str_tpu.geometry import frames as F
from str2str_tpu.geometry import rotations as R
from str2str_tpu.geometry.rigid import Rigid
from str2str_tpu.training.losses import LossConfig, score_matching_loss


def _make_batch(rng, B=3, L=12):
    """Self-consistent gt frames + fake predictions/scores."""
    rotvec = np.cumsum(rng.randn(B, L, 3) * 0.2, axis=1).astype(np.float32)
    trans = np.cumsum(rng.randn(B, L, 3) + np.asarray([3.8, 0, 0]), axis=1).astype(np.float32)
    rot = np.asarray(R.axis_angle_to_matrix(jnp.asarray(rotvec)))
    aatype = rng.randint(0, 20, (B, L)).astype(np.int32)
    psi = rng.randn(B, L, 2).astype(np.float32)
    psi /= np.linalg.norm(psi, axis=-1, keepdims=True)
    atom37, mask37, _ = F.compute_backbone(
        Rigid(jnp.asarray(rot), jnp.asarray(trans)), jnp.asarray(psi),
        jnp.asarray(aatype))
    fr = F.atom37_to_frames(jnp.asarray(aatype), atom37,
                            mask37.astype(jnp.float32))
    gt_frames = np.asarray(fr["rigidgroups_gt_frames"])
    tors = np.zeros((B, L, 7, 2), np.float32)
    tors[..., 2, :] = psi

    batch = {
        "t": np.asarray([0.1, 0.5, 0.9], np.float32)[:B],
        "seq_mask": np.ones((B, L), np.float32),
        "fixed_mask": np.zeros((B, L), np.float32),
        "rot_score": rng.randn(B, L, 3).astype(np.float32),
        "trans_score": rng.randn(B, L, 3).astype(np.float32),
        "rot_score_scaling": np.asarray([1.5, 1.0, 0.7], np.float32)[:B],
        "trans_score_scaling": np.asarray([2.0, 1.2, 1.0], np.float32)[:B],
        "gt_trans_0": trans,
        "torsion_angles_sin_cos": tors,
        "aatype": aatype,
        "rigidgroups_gt_frames": gt_frames,
    }
    out = {
        "rot_score": rng.randn(B, L, 3).astype(np.float32),
        "trans_score": rng.randn(B, L, 3).astype(np.float32),
        "trans": trans + 0.5 * rng.randn(B, L, 3).astype(np.float32),
        "atom37": np.asarray(atom37) + 0.3 * rng.randn(B, L, 37, 3).astype(np.float32),
    }
    return out, batch


def test_loss_finite_and_breakdown(rng):
    out, batch = _make_batch(rng)
    total, bd = score_matching_loss(
        {k: jnp.asarray(v) for k, v in out.items()},
        {k: jnp.asarray(v) for k, v in batch.items()})
    assert np.isfinite(float(total))
    for k in ("translation", "rotation", "backbone", "pwd", "loss"):
        assert k in bd and np.isfinite(float(bd[k]))
    # Zero prediction errors -> score terms driven only by gt scores.
    out2 = dict(out)
    out2["rot_score"] = batch["rot_score"]
    out2["trans_score"] = batch["trans_score"]
    out2["trans"] = batch["gt_trans_0"]
    _, bd2 = score_matching_loss(
        {k: jnp.asarray(v) for k, v in out2.items()},
        {k: jnp.asarray(v) for k, v in batch.items()})
    assert float(bd2["translation"]) < 1e-10
    assert float(bd2["rotation"]) < 1e-10


def test_loss_respects_masks(rng):
    out, batch = _make_batch(rng)
    # Fixing every residue zeroes the score losses.
    batch2 = dict(batch)
    batch2["fixed_mask"] = np.ones_like(batch["fixed_mask"])
    _, bd = score_matching_loss(
        {k: jnp.asarray(v) for k, v in out.items()},
        {k: jnp.asarray(v) for k, v in batch2.items()})
    assert float(bd["translation"]) < 1e-8
    assert float(bd["rotation"]) < 1e-8


@pytest.mark.parity
def test_loss_parity_with_reference(rng, reference_available):
    if not reference_available:
        pytest.skip("no reference checkout")
    import torch
    import ml_collections
    from tests.conftest import load_reference_module
    ref_loss = load_reference_module("src/models/loss.py", "ref_loss")
    ref_rigid = load_reference_module("src/common/rigid_utils.py", "ref_rigid2")

    out, batch = _make_batch(rng)

    cfg = ml_collections.ConfigDict({
        "translation": {"weight": 1.0, "coordinate_scaling": 0.1, "x0_threshold": 1.0},
        "rotation": {"weight": 1.0},
        "distogram": {"enabled": False}, "supervised_chi": {"enabled": False},
        "lddt": {"enabled": False}, "fape": {"enabled": False},
        "tm": {"enabled": False},
        "backbone": {"enabled": True, "weight": 0.25, "t_threshold": 0.25},
        "pwd": {"enabled": True, "weight": 0.25, "t_threshold": 0.25},
        "eps": 1e-6,
    })
    ref = ref_loss.ScoreMatchingLoss(cfg)

    t_out = {k: torch.tensor(v) for k, v in out.items()}
    t_batch = {k: torch.tensor(v) for k, v in batch.items()}
    t_batch["aatype"] = t_batch["aatype"].long()
    # Reference expects Rigid objects for rigids_0.
    t_batch["rigids_0"] = ref_rigid.Rigid.from_tensor_4x4(
        torch.tensor(batch["rigidgroups_gt_frames"][..., 0, :, :]))
    # The reference reads predicted trans via out['rigids'].get_trans().
    quat = np.zeros(out["trans"].shape[:-1] + (4,), np.float32)
    quat[..., 0] = 1.0
    t_out["rigids"] = ref_rigid.Rigid.from_tensor_7(
        torch.tensor(np.concatenate([quat, out["trans"]], axis=-1)))

    ref_total, ref_bd = ref(t_out, t_batch, _return_breakdown=True)

    my_total, my_bd = score_matching_loss(
        {k: jnp.asarray(v) for k, v in out.items()},
        {k: jnp.asarray(v) for k, v in batch.items()})

    for k in ("translation", "rotation", "backbone", "pwd"):
        np.testing.assert_allclose(
            float(my_bd[k]), float(ref_bd[k]), rtol=2e-4, atol=1e-5,
            err_msg=f"loss term {k}")
    np.testing.assert_allclose(float(my_total), float(ref_total), rtol=2e-4)


@pytest.mark.slow
def test_gated_extra_losses(rng):
    """Reference config-gated extras (loss.py:1674-1701): enabling
    distogram/supervised_chi/lddt/tm computes finite, weighted terms when
    the matching head outputs are provided (and KeyErrors like the
    reference when they are not)."""
    import pytest

    out, batch = _make_batch(rng)
    B, L = batch["seq_mask"].shape
    quat = np.zeros((B, L, 4), np.float32)
    quat[..., 0] = 1.0
    out["quat"] = quat
    out["distogram_logits"] = rng.randn(B, L, L, 64).astype(np.float32)
    psi = batch["torsion_angles_sin_cos"][..., 2:3, :]
    out["sm_angles"] = psi
    out["sm_unnormalized_angles"] = psi * 2.0
    out["lddt_logits"] = rng.randn(B, L, 50).astype(np.float32)
    out["tm_logits"] = rng.randn(B, L, L, 64).astype(np.float32)
    batch["pseudo_beta"] = batch["gt_trans_0"]
    batch["pseudo_beta_mask"] = batch["seq_mask"]

    cfg = LossConfig(distogram_enabled=True, supervised_chi_enabled=True,
                     lddt_enabled=True, tm_enabled=True)
    total, bd = score_matching_loss(
        {k: jnp.asarray(v) for k, v in out.items()},
        {k: jnp.asarray(v) for k, v in batch.items()}, cfg)
    for k in ("distogram", "supervised_chi", "lddt", "tm"):
        assert k in bd and np.isfinite(float(bd[k])), k
    assert np.isfinite(float(total))
    # exact psi prediction -> supervised_chi reduces to the norm penalty
    assert float(bd["supervised_chi"]) < 0.1

    # missing head outputs fail loudly, like the reference's out["..."]
    bare = {k: jnp.asarray(v) for k, v in out.items()
            if k not in ("distogram_logits",)}
    with pytest.raises(KeyError):
        score_matching_loss(bare,
                            {k: jnp.asarray(v) for k, v in batch.items()},
                            LossConfig(distogram_enabled=True))


def test_loss_config_from_reads_gates():
    from str2str_tpu.config.core import load_config
    from str2str_tpu.training.losses import loss_config_from

    cfg = load_config("train", ["model.loss.tm.enabled=true",
                                "model.loss.distogram.weight=0.3"])
    lc = loss_config_from(cfg)
    assert lc.tm_enabled is True and lc.distogram_enabled is False
    assert lc.distogram_weight == 0.3
    assert lc.supervised_chi_enabled is False and lc.lddt_enabled is False
