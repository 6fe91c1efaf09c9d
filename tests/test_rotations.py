import jax
import jax.numpy as jnp
import numpy as np
import pytest

from str2str_tpu.geometry import rotations as R

jax.config.update("jax_enable_x64", False)


def _random_rotvecs(rng, n=256, max_angle=np.pi * 0.999):
    v = rng.randn(n, 3)
    v = v / np.linalg.norm(v, axis=-1, keepdims=True)
    ang = rng.uniform(1e-6, max_angle, size=(n, 1))
    return (v * ang).astype(np.float32)


def test_quat_matrix_roundtrip(rng):
    q = np.asarray(R.random_quat(jax.random.PRNGKey(0), (512,)))
    m = R.quat_to_matrix(q)
    # Orthonormality & det +1.
    eye = jnp.einsum("...ij,...kj->...ik", m, m)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (512, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(np.asarray(m)), 1.0, atol=1e-5)
    q2 = np.asarray(R.matrix_to_quat(m))
    np.testing.assert_allclose(np.abs(np.sum(q * q2, axis=-1)), 1.0, atol=1e-5)


def test_axis_angle_roundtrip(rng):
    v = _random_rotvecs(rng)
    v2 = np.asarray(R.quat_to_axis_angle(R.axis_angle_to_quat(v)))
    np.testing.assert_allclose(v, v2, atol=1e-4)
    m = R.axis_angle_to_matrix(v)
    v3 = np.asarray(R.matrix_to_axis_angle(m))
    np.testing.assert_allclose(v, v3, atol=2e-4)


def test_small_angle_stability():
    v = jnp.asarray([[1e-9, 0, 0], [0.0, 0.0, 0.0], [1e-4, -1e-4, 1e-5]])
    q = R.axis_angle_to_quat(v)
    assert np.all(np.isfinite(np.asarray(q)))
    back = R.quat_to_axis_angle(q)
    np.testing.assert_allclose(np.asarray(back), np.asarray(v), atol=1e-7)
    # Gradient safety at exactly zero.
    g = jax.grad(lambda x: jnp.sum(R.axis_angle_to_quat(x)))(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))


def test_compose_matches_matrix_product(rng):
    v1, v2 = _random_rotvecs(rng, 128), _random_rotvecs(rng, 128)
    composed = R.compose_axis_angle(v1, v2)
    m = np.asarray(R.axis_angle_to_matrix(v1)) @ np.asarray(R.axis_angle_to_matrix(v2))
    np.testing.assert_allclose(
        np.asarray(R.axis_angle_to_matrix(composed)), m, atol=1e-4)


def test_quat_rotate_matches_matrix(rng):
    q = np.asarray(R.random_quat(jax.random.PRNGKey(1), (64,)))
    pts = rng.randn(64, 3).astype(np.float32)
    out1 = np.asarray(R.quat_rotate(q, pts))
    out2 = np.einsum("nij,nj->ni", np.asarray(R.quat_to_matrix(q)), pts)
    np.testing.assert_allclose(out1, out2, atol=1e-5)


@pytest.mark.parity
def test_parity_with_reference_rotation3d(rng, reference_available):
    if not reference_available:
        pytest.skip("no reference checkout")
    import torch
    from tests.conftest import load_reference_module
    r3d = load_reference_module("src/common/rotation3d.py", "ref_rotation3d")

    v = _random_rotvecs(rng, 256)
    ref_m = r3d.axis_angle_to_matrix(torch.tensor(v)).numpy()
    np.testing.assert_allclose(np.asarray(R.axis_angle_to_matrix(v)), ref_m, atol=1e-5)

    ref_q = r3d.matrix_to_quaternion(torch.tensor(ref_m)).numpy()
    my_q = np.asarray(R.matrix_to_quat(jnp.asarray(ref_m)))
    # Same rotation up to sign.
    np.testing.assert_allclose(np.abs(np.sum(ref_q * my_q, axis=-1)), 1.0, atol=1e-5)

    # pytorch3d leaves angles in (pi, 2*pi) when w < 0; we standardize to
    # [0, pi]. Both encode the same rotation, so compare as matrices.
    ref_v = r3d.quaternion_to_axis_angle(torch.tensor(ref_q)).numpy()
    my_v = np.asarray(R.quat_to_axis_angle(jnp.asarray(ref_q)))
    np.testing.assert_allclose(
        np.asarray(R.axis_angle_to_matrix(jnp.asarray(my_v))),
        r3d.axis_angle_to_matrix(torch.tensor(ref_v)).numpy(),
        atol=1e-4,
    )


@pytest.mark.parity
def test_euler_and_6d_converters_match_reference(rng, reference_available):
    """euler_angles_to_matrix / matrix_to_euler_angles /
    rotation_6d_to_matrix / matrix_to_rotation_6d vs the reference
    rotation3d.py (PyTorch3D converter surface)."""
    if not reference_available:
        pytest.skip("no reference checkout")
    import torch
    from tests.conftest import load_reference_module
    ref = load_reference_module("src/common/rotation3d.py", "ref_rot3d_eul")

    angles = (rng.rand(4, 5, 3).astype(np.float32) - 0.5) * 2.0
    for conv in ("XYZ", "ZYX", "ZXZ", "YXY"):
        got = np.asarray(R.euler_angles_to_matrix(jnp.asarray(angles), conv))
        want = ref.euler_angles_to_matrix(torch.tensor(angles), conv).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5, err_msg=conv)

        back = np.asarray(R.matrix_to_euler_angles(jnp.asarray(want), conv))
        want_back = ref.matrix_to_euler_angles(
            torch.tensor(want), conv).numpy()
        np.testing.assert_allclose(back, want_back, atol=1e-4, err_msg=conv)
        # round trip reproduces the rotation
        again = np.asarray(R.euler_angles_to_matrix(jnp.asarray(back), conv))
        np.testing.assert_allclose(again, want, atol=1e-4, err_msg=conv)

    d6 = rng.randn(6, 6).astype(np.float32)
    got = np.asarray(R.rotation_6d_to_matrix(jnp.asarray(d6)))
    want = ref.rotation_6d_to_matrix(torch.tensor(d6)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)
    got6 = np.asarray(R.matrix_to_rotation_6d(jnp.asarray(want)))
    want6 = ref.matrix_to_rotation_6d(torch.tensor(want)).numpy()
    np.testing.assert_allclose(got6, want6, atol=1e-6)
    # orthonormality of the reconstruction
    eye = np.einsum("bij,bkj->bik", got, got)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (6, 1, 1)), atol=1e-5)
