import jax
import jax.numpy as jnp
import numpy as np
import pytest

from str2str_tpu.geometry import rotations as R
from str2str_tpu.geometry.rigid import Rigid
from str2str_tpu.training import aux_losses as AL


def _rigids(rng, B=2, N=10):
    rotvec = np.cumsum(rng.randn(B, N, 3) * 0.2, axis=1).astype(np.float32)
    trans = np.cumsum(rng.randn(B, N, 3) + np.asarray([3.8, 0, 0]), axis=1).astype(np.float32)
    return Rigid(R.axis_angle_to_matrix(jnp.asarray(rotvec)), jnp.asarray(trans))


def test_fape_zero_for_identical(rng):
    r = _rigids(rng)
    mask = jnp.ones(r.shape)
    fape = AL.compute_fape(r, r, mask, r.trans, r.trans, mask)
    np.testing.assert_allclose(np.asarray(fape), 0.0, atol=1e-3)


def test_fape_invariant_to_global_transform(rng):
    """FAPE must be invariant when pred = global_transform(target)."""
    r = _rigids(rng)
    mask = jnp.ones(r.shape)
    g = Rigid(R.axis_angle_to_matrix(jnp.asarray([[0.5, -0.3, 0.8]])),
              jnp.asarray([[10.0, -5.0, 3.0]]))
    moved = Rigid(
        jnp.einsum("bij,bnjk->bnik", g.rot.repeat(r.rot.shape[0], 0), r.rot),
        jnp.einsum("bij,bnj->bni", g.rot.repeat(r.rot.shape[0], 0), r.trans)
        + g.trans[:, None])
    fape = AL.compute_fape(moved, r, mask, moved.trans, r.trans, mask)
    np.testing.assert_allclose(np.asarray(fape), 0.0, atol=1e-2)
    # but a local perturbation is penalized
    pert = Rigid(moved.rot, moved.trans.at[:, 0].add(5.0))
    fape2 = AL.compute_fape(pert, r, mask, pert.trans, r.trans, mask)
    assert np.all(np.asarray(fape2) > 0.01)


def test_bond_loss_flags_broken_chain(rng):
    from str2str_tpu.geometry import frames as F
    B, N = 1, 8
    r = _rigids(rng, B, N)
    aatype = jnp.zeros((B, N), jnp.int32)
    psi = jnp.tile(jnp.asarray([0.0, 1.0]), (B, N, 1))
    atom37, mask37, atom14 = F.compute_backbone(r, psi, aatype)
    atom14_mask = F.make_atom14_masks(aatype)["atom14_atom_exists"]
    res_idx = jnp.tile(jnp.arange(N), (B, 1))

    ok = AL.between_residue_bond_loss(atom14, atom14_mask, res_idx, aatype)
    # Break the chain: move one residue far away.
    broken14 = atom14.at[:, 4].add(30.0)
    bad = AL.between_residue_bond_loss(broken14, atom14_mask, res_idx, aatype)
    assert float(np.asarray(bad["c_n_loss_mean"]).mean()) > float(np.asarray(ok["c_n_loss_mean"]).mean()) + 1.0
    assert float(bad["per_residue_violation"].sum()) >= 1.0


def test_clash_loss_detects_overlap(rng):
    B, N = 1, 6
    aatype = jnp.zeros((B, N), jnp.int32)
    pos = jnp.zeros((B, N, 14, 3))
    # Spread residues far apart, then collide residues 0 and 3.
    pos = pos.at[:, :, 1, :].set(
        jnp.arange(N, dtype=jnp.float32)[None, :, None] * jnp.asarray([20.0, 0, 0]))
    mask = jnp.zeros((B, N, 14)).at[:, :, 1].set(1.0)
    res_idx = jnp.tile(jnp.arange(N), (B, 1))
    far = AL.between_residue_clash_loss(pos, mask, aatype, res_idx)
    collided = pos.at[:, 3, 1, :].set(pos[:, 0, 1, :] + 0.2)
    near = AL.between_residue_clash_loss(collided, mask, aatype, res_idx)
    assert float(near["mean_loss"].mean()) > float(far["mean_loss"].mean())
    assert float(near["per_atom_clash"].sum()) > 0


def test_supervised_torsion_loss_periodic(rng):
    gt = jnp.asarray(rng.randn(2, 5, 1, 2), jnp.float32)
    gt = gt / jnp.linalg.norm(gt, axis=-1, keepdims=True)
    mask = jnp.ones((2, 5, 1))
    # exact prediction -> only the norm term remains (zero for unit norms)
    loss = AL.supervised_torsion_loss(gt, gt, gt, -gt, mask)
    assert float(loss) < 1e-5
    # pi-flipped prediction matches the alternative ground truth
    loss_flip = AL.supervised_torsion_loss(-gt, -gt, gt, -gt, mask)
    assert float(loss_flip) < 1e-5


def test_fape_in_score_matching_loss(rng):
    from tests.test_losses import _make_batch
    from str2str_tpu.training.losses import LossConfig, score_matching_loss

    out, batch = _make_batch(rng)
    quat = np.zeros(out["trans"].shape[:-1] + (4,), np.float32)
    quat[..., 0] = 1.0
    out["quat"] = quat
    total, bd = score_matching_loss(
        {k: jnp.asarray(v) for k, v in out.items()},
        {k: jnp.asarray(v) for k, v in batch.items()},
        LossConfig(fape_enabled=True))
    assert "fape" in bd and np.isfinite(float(bd["fape"]))
