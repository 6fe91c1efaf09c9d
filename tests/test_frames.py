import jax
import jax.numpy as jnp
import numpy as np
import pytest

from str2str_tpu.geometry import chemical as ch
from str2str_tpu.geometry import frames as F
from str2str_tpu.geometry.rigid import Rigid


def _random_protein(rng, n=24):
    """Random but self-consistent atom37 inputs: idealized residues placed at
    random rigid frames."""
    from str2str_tpu.geometry import rotations as R

    aatype = rng.randint(0, 20, size=(n,)).astype(np.int32)
    v = rng.randn(n, 3).astype(np.float32) * 0.8
    rot = np.asarray(R.axis_angle_to_matrix(jnp.asarray(v)))
    trans = (rng.randn(n, 3) * 10).astype(np.float32)

    pos37 = np.zeros((n, 37, 3), dtype=np.float32)
    mask37 = np.zeros((n, 37), dtype=np.float32)
    for i, aa in enumerate(aatype):
        name3 = ch.restype_1to3[ch.restypes[aa]]
        for atom_name, group, p in ch.rigid_group_atom_positions[name3]:
            if group != 0:  # place only backbone-group atoms rigidly
                continue
            j = ch.atom_order[atom_name]
            pos37[i, j] = rot[i] @ np.asarray(p, np.float32) + trans[i]
            mask37[i, j] = 1.0
    return aatype, pos37, mask37


def test_atom37_to_frames_recovers_backbone_frame(rng):
    aatype, pos37, mask37 = _random_protein(rng)
    out = F.atom37_to_frames(jnp.asarray(aatype), jnp.asarray(pos37), jnp.asarray(mask37))
    gt = np.asarray(out["rigidgroups_gt_frames"])  # (N, 8, 4, 4)
    assert gt.shape == (len(aatype), 8, 4, 4)
    bb = gt[:, 0]
    # The backbone frame's origin is CA.
    np.testing.assert_allclose(bb[:, :3, 3], pos37[:, ch.CA_IDX], atol=1e-4)
    # Valid rotation.
    rtr = np.einsum("nij,nkj->nik", bb[:, :3, :3], bb[:, :3, :3])
    np.testing.assert_allclose(rtr, np.tile(np.eye(3), (len(aatype), 1, 1)), atol=1e-4)


@pytest.mark.slow
def test_frames_to_atoms_roundtrip(rng):
    """atom37 -> frames+torsions -> atoms reproduces the backbone positions."""
    aatype, pos37, mask37 = _random_protein(rng)
    frames = F.atom37_to_frames(jnp.asarray(aatype), jnp.asarray(pos37), jnp.asarray(mask37))
    tors = F.atom37_to_torsion_angles(jnp.asarray(aatype), jnp.asarray(pos37), jnp.asarray(mask37))
    bb = Rigid.from_tensor_4x4(frames["rigidgroups_gt_frames"][..., 0, :, :])
    psi = tors["torsion_angles_sin_cos"][..., 2, :]
    atom37, atom37_mask, atom14 = F.compute_backbone(bb, psi, jnp.asarray(aatype))
    atom37 = np.asarray(atom37)
    # N, CA, C are reconstructed exactly from backbone-frame geometry.
    for idx in (0, 1, 2):
        np.testing.assert_allclose(atom37[:, idx], pos37[:, idx], atol=2e-3)
    # O placed only where psi was defined (interior residues).
    psi_mask = np.asarray(tors["torsion_angles_mask"])[:, 2]
    o_err = np.linalg.norm(atom37[:, 4] - pos37[:, 4], axis=-1) * psi_mask
    assert o_err.max() < 5e-3


@pytest.mark.parity
@pytest.mark.slow
def test_parity_with_reference_transforms(rng, reference_available):
    if not reference_available:
        pytest.skip("no reference checkout")
    import torch
    from tests.conftest import load_reference_module
    dt = load_reference_module("src/common/data_transforms.py", "ref_dt")

    aatype, pos37, mask37 = _random_protein(rng, n=16)
    prot = {
        "aatype": torch.tensor(aatype, dtype=torch.long),
        "all_atom_positions": torch.tensor(pos37, dtype=torch.double),
        "all_atom_mask": torch.tensor(mask37, dtype=torch.double),
    }
    ref_frames = dt.atom37_to_frames(dict(prot))
    ref_tors = dt.atom37_to_torsion_angles("")(dict(prot))

    mine_frames = F.atom37_to_frames(jnp.asarray(aatype), jnp.asarray(pos37), jnp.asarray(mask37))
    mine_tors = F.atom37_to_torsion_angles(jnp.asarray(aatype), jnp.asarray(pos37), jnp.asarray(mask37))

    np.testing.assert_allclose(
        np.asarray(mine_frames["rigidgroups_gt_frames"]),
        ref_frames["rigidgroups_gt_frames"].numpy(), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(mine_frames["rigidgroups_gt_exists"]),
        ref_frames["rigidgroups_gt_exists"].numpy(), atol=1e-6)
    tors_mask = ref_tors["torsion_angles_mask"].numpy()[..., None]
    np.testing.assert_allclose(
        np.asarray(mine_tors["torsion_angles_sin_cos"]) * tors_mask,
        ref_tors["torsion_angles_sin_cos"].numpy() * tors_mask, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(mine_tors["torsion_angles_mask"]),
        ref_tors["torsion_angles_mask"].numpy(), atol=1e-6)


@pytest.mark.parity
@pytest.mark.slow
def test_parity_compute_backbone(rng, reference_available):
    if not reference_available:
        pytest.skip("no reference checkout")
    import torch
    from tests.conftest import load_reference_module
    aa_mod = load_reference_module("src/common/all_atom.py", "ref_all_atom")
    ru = load_reference_module("src/common/rigid_utils.py", "ref_rigid_utils")

    n = 16
    aatype, pos37, mask37 = _random_protein(rng, n=n)
    frames = F.atom37_to_frames(jnp.asarray(aatype), jnp.asarray(pos37), jnp.asarray(mask37))
    bb_4x4 = np.asarray(frames["rigidgroups_gt_frames"])[None, :, 0]
    psi = rng.randn(1, n, 2).astype(np.float32)
    psi = psi / np.linalg.norm(psi, axis=-1, keepdims=True)

    ref_rigids = ru.Rigid.from_tensor_4x4(torch.tensor(bb_4x4))
    ref_atom37, _, _, ref_atom14 = aa_mod.compute_backbone(
        ref_rigids, torch.tensor(psi), aatype=torch.tensor(aatype[None], dtype=torch.long))

    my37, _, my14 = F.compute_backbone(
        Rigid.from_tensor_4x4(jnp.asarray(bb_4x4)), jnp.asarray(psi), jnp.asarray(aatype[None]))
    np.testing.assert_allclose(np.asarray(my37), ref_atom37.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(my14), ref_atom14.numpy(), atol=1e-4)


def test_kabsch_rmsd(rng):
    from str2str_tpu.geometry.align import rmsd
    from str2str_tpu.geometry import rotations as R

    x = jnp.asarray(rng.randn(5, 20, 3) * 5, jnp.float32)
    rot = R.axis_angle_to_matrix(jnp.asarray(rng.randn(5, 3), jnp.float32))
    moved = jnp.einsum("bij,bnj->bni", rot, x) + jnp.asarray(
        rng.randn(5, 1, 3) * 10, jnp.float32)
    # Rigid transforms align to ~0 RMSD.
    np.testing.assert_allclose(np.asarray(rmsd(moved, x)), 0.0, atol=1e-4)
    # Added noise shows up as RMSD of the right magnitude.
    noisy = moved + 0.5 * jnp.asarray(rng.randn(5, 20, 3), jnp.float32)
    r = np.asarray(rmsd(noisy, x))
    assert np.all((r > 0.3) & (r < 1.2))
