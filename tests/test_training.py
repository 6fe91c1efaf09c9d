import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from str2str_tpu.diffusion.r3 import R3Config, R3Diffusion
from str2str_tpu.diffusion.se3 import SE3Diffusion
from str2str_tpu.diffusion.so3 import SO3Config, SO3Diffusion
from str2str_tpu.model.network import NetworkConfig, ScoreNetwork
from str2str_tpu.parallel import mesh as mesh_lib
from str2str_tpu.training.losses import LossConfig
from str2str_tpu.training.trainer import (TrainConfig, Trainer,
                                          get_learning_rate, set_learning_rate)


def _tiny_setup(num_devices=1):
    net = ScoreNetwork(NetworkConfig(
        no_ipa_blocks=2, node_embed_size=64, edge_embed_size=32,
        c_hidden=64, skip_embed_size=16, transformer_num_layers=1))
    diffuser = SE3Diffusion(
        trans=R3Diffusion(R3Config(coordinate_scaling=0.1)),
        rotation=SO3Diffusion(SO3Config(num_sigma=20, num_omega=50,
                                        n_terms=100,
                                        cache_dir=tempfile.mkdtemp())),
        min_t=1e-2)
    trainer = Trainer(net, diffuser, LossConfig(),
                      TrainConfig(lr=5e-4, num_devices=num_devices, seed=0))
    trainer.compile()
    return net, trainer


def _batch(rng, B=4, L=16):
    from str2str_tpu.geometry import frames as F
    from str2str_tpu.geometry import rotations as R
    from str2str_tpu.geometry.rigid import Rigid

    rotvec = np.cumsum(rng.randn(B, L, 3) * 0.2, axis=1).astype(np.float32)
    trans = np.cumsum(rng.randn(B, L, 3) + np.asarray([3.8, 0, 0]), axis=1).astype(np.float32)
    trans -= trans.mean(1, keepdims=True)
    aatype = rng.randint(0, 20, (B, L)).astype(np.int32)
    psi = rng.randn(B, L, 2).astype(np.float32)
    psi /= np.linalg.norm(psi, axis=-1, keepdims=True)
    rot = np.asarray(R.axis_angle_to_matrix(jnp.asarray(rotvec)))
    atom37, mask37, _ = F.compute_backbone(
        Rigid(jnp.asarray(rot), jnp.asarray(trans)), jnp.asarray(psi),
        jnp.asarray(aatype))
    fr = F.atom37_to_frames(jnp.asarray(aatype), atom37, mask37.astype(jnp.float32))
    tors = np.zeros((B, L, 7, 2), np.float32)
    tors[..., 2, :] = psi
    return {
        "rigidgroups_gt_frames": np.asarray(fr["rigidgroups_gt_frames"]),
        "residue_idx": np.tile(np.arange(L, dtype=np.int32), (B, 1)),
        "residue_mask": np.ones((B, L), np.float32),
        "seq_mask": np.ones((B, L), np.float32),
        "fixed_mask": np.zeros((B, L), np.float32),
        "torsion_angles_sin_cos": tors,
        "aatype": aatype,
    }


def _init_params(net, batch):
    B, L = batch["aatype"].shape
    q = np.zeros((B, L, 4), np.float32)
    q[..., 0] = 1.0
    return net.init(jax.random.PRNGKey(0), {
        "rigids_t": jnp.asarray(np.concatenate([q, np.zeros((B, L, 3), np.float32)], -1)),
        "t": jnp.full((B,), 0.5),
        "residue_idx": jnp.asarray(batch["residue_idx"]),
        "residue_mask": jnp.asarray(batch["residue_mask"]),
        "fixed_mask": jnp.asarray(batch["fixed_mask"]),
        "sc_ca_t": jnp.zeros((B, L, 3)),
        "torsion_angles_sin_cos": jnp.asarray(batch["torsion_angles_sin_cos"]),
        "aatype": jnp.asarray(batch["aatype"]),
    })


@pytest.mark.slow
def test_loss_decreases_on_overfit(rng):
    """Loss trends down when overfitting one batch. The per-step loss is
    high-variance (t ~ U(min_t, 1) re-drawn each step), so compare wide
    windows over a longer run."""
    net, trainer = _tiny_setup()
    batch = _batch(rng)
    params = _init_params(net, batch)
    opt_state = trainer.optimizer.init(params)
    key = jax.random.PRNGKey(0)
    losses = []
    sharded = mesh_lib.shard_batch(batch, trainer.mesh)
    for i in range(150):
        key, k = jax.random.split(key)
        params, opt_state, metrics = trainer.train_step(params, opt_state, k, sharded)
        losses.append(float(metrics["loss"]))
    first, last = np.mean(losses[:30]), np.mean(losses[-30:])
    assert np.isfinite(losses).all()
    assert last < 0.8 * first, (first, last)


def test_multi_device_step_matches_single(rng):
    """The sharded step must produce the same grads/update as unsharded."""
    n_dev = len(jax.devices())
    if n_dev < 2:
        pytest.skip("needs multiple devices")
    batch = _batch(rng, B=8)
    net, trainer1 = _tiny_setup(num_devices=1)
    _, trainer8 = _tiny_setup(num_devices=n_dev)
    params = _init_params(net, batch)
    # train_step donates params/opt_state buffers; give each call its own copy.
    params1 = jax.tree.map(jnp.array, params)
    params8 = jax.tree.map(jnp.array, params)
    opt1 = trainer1.optimizer.init(params1)
    opt8 = trainer8.optimizer.init(params8)
    key = jax.random.PRNGKey(3)
    p1, _, m1 = trainer1.train_step(params1, opt1, key,
                                    mesh_lib.shard_batch(batch, trainer1.mesh))
    p8, _, m8 = trainer8.train_step(params8, opt8, key,
                                    mesh_lib.shard_batch(batch, trainer8.mesh))
    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-4)
    l1 = jax.tree.leaves(p1)
    l8 = jax.tree.leaves(p8)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_lr_plateau_setter():
    net, trainer = _tiny_setup()
    rng = np.random.RandomState(0)
    batch = _batch(rng, B=2, L=8)
    params = _init_params(net, batch)
    opt_state = trainer.optimizer.init(params)
    assert abs(get_learning_rate(opt_state) - 5e-4) < 1e-9
    opt_state = set_learning_rate(opt_state, 5e-5)
    assert abs(get_learning_rate(opt_state) - 5e-5) < 1e-9


def test_checkpoint_roundtrip(tmp_path, rng):
    from str2str_tpu.utils import checkpoints as C
    tree = {"params": {"a": np.arange(6, dtype=np.float32).reshape(2, 3)},
            "step": 7}
    C.save_checkpoint(str(tmp_path / "step_7"), tree)
    restored = C.load_checkpoint(str(tmp_path / "step_7"))
    np.testing.assert_array_equal(restored["params"]["a"], tree["params"]["a"])
    assert int(restored["step"]) == 7
    assert C.latest_checkpoint(str(tmp_path)) == str(tmp_path / "step_7")


def test_grads_finite_at_identity_prediction(rng):
    """Regression: at step 1 the zero-init update head predicts exactly the
    input rotation; the relative-quaternion score path must still have finite
    gradients (gradient-safe norms in quat_to_axis_angle / so3.score)."""
    import optax

    net, trainer = _tiny_setup()
    batch = _batch(rng, B=2, L=12)
    params = _init_params(net, batch)

    def loss_fn(p, key):
        loss, _ = trainer.model_step(p, key, batch, deterministic=True)
        return loss

    grads = jax.grad(loss_fn)(params, jax.random.PRNGKey(0))
    gnorm = float(optax.global_norm(grads))
    assert np.isfinite(gnorm), gnorm
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
