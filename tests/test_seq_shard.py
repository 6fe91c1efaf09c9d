"""Sequence-sharded long-context path (parallel/seq_shard.py).

The reference caps L at 500 (configs/data/protein.yaml:10-11) because its
IPA trunk is O(L^2) on one device. Here the whole score network runs inside
shard_map with the edge tensors column-sharded over the mesh; these tests
assert exact parity with the unsharded network on the virtual 8-device CPU
mesh, and that end-to-end sampling works at L = 1024.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from str2str_tpu.model.network import NetworkConfig, ScoreNetwork

pytestmark = pytest.mark.slow


def _small_cfg(**kw):
    return NetworkConfig(
        init_embed_size=8, node_embed_size=32, edge_embed_size=16,
        no_ipa_blocks=2, skip_embed_size=8, transformer_num_heads=2,
        transformer_num_layers=1, c_hidden=16, no_heads=4,
        no_qk_points=4, no_v_points=6, dropout=0.0,
        use_pallas="off", use_pallas_ipa="off", **kw)


def _batch(rng, B, L):
    from str2str_tpu.geometry import rotations as R
    quat = np.asarray(R.random_quat(jax.random.PRNGKey(0), (B, L)))
    frames = np.zeros((B, L, 8, 4, 4), np.float32)
    # network only reads [..., 0, :, :]
    from str2str_tpu.geometry.rotations import quat_to_matrix
    rot = np.asarray(quat_to_matrix(jnp.asarray(quat)))
    frames[..., 0, :3, :3] = rot
    frames[..., 0, 3, 3] = 1.0
    frames[..., 0, :3, 3] = rng.randn(B, L, 3) * 5
    mask = np.ones((B, L), np.float32)
    mask[:, -3:] = 0
    return {
        "rigids_t": np.concatenate(
            [quat, rng.randn(B, L, 3).astype(np.float32) * 5], -1),
        "t": np.full((B,), 0.4, np.float32),
        "residue_idx": np.tile(np.arange(L, dtype=np.int32), (B, 1)),
        "residue_mask": mask,
        "fixed_mask": np.zeros((B, L), np.float32),
        "sc_ca_t": rng.randn(B, L, 3).astype(np.float32),
        "torsion_angles_sin_cos": rng.randn(B, L, 7, 2).astype(np.float32),
        "aatype": np.zeros((B, L), np.int32),
    }


def test_seq_sharded_network_matches_unsharded(rng):
    from str2str_tpu.parallel.compat import shard_map
    from jax.sharding import PartitionSpec as P

    B, L = 2, 64
    batch = {k: jnp.asarray(v) for k, v in _batch(rng, B, L).items()}

    net = ScoreNetwork(_small_cfg())
    params = net.init(jax.random.PRNGKey(1), batch)
    ref = net.apply(params, batch)

    devs = np.array(jax.devices()[:8])
    mesh = Mesh(devs, ("seq",))
    snet = ScoreNetwork(_small_cfg(seq_axis="seq"))

    fn = shard_map(lambda p, b: snet.apply(p, b), mesh=mesh,
                   in_specs=(P(), P()), out_specs=P(), check_rep=False)
    out = fn(params, batch)

    m = np.asarray(batch["residue_mask"])[..., None]
    for key in ("quat", "trans", "psi"):
        np.testing.assert_allclose(
            np.asarray(ref[key]) * m, np.asarray(out[key]) * m,
            atol=1e-4, rtol=1e-4, err_msg=key)
    np.testing.assert_allclose(
        np.asarray(ref["atom37"]) * m[..., None],
        np.asarray(out["atom37"]) * m[..., None], atol=2e-3, err_msg="atom37")


def test_seq_sharded_sampler_matches_unsharded(rng):
    """Full anneal through the sharded trunk == unsharded, same seed."""
    from str2str_tpu.sampling.sampler import Sampler, SamplerConfig, build_schedule

    B, L = 2, 32
    feats = {k: jnp.asarray(v) for k, v in _batch(rng, B, L).items()}
    feats["rigidgroups_gt_frames"] = jnp.asarray(_make_frames(rng, B, L))

    diffuser = _diffuser()
    cfg = SamplerConfig(num_timesteps=10, replica_per_batch=B)

    net = ScoreNetwork(_small_cfg())
    params = net.init(jax.random.PRNGKey(1), feats)
    plain = Sampler(net, diffuser, cfg)

    devs = np.array(jax.devices()[:4])
    mesh = Mesh(devs, ("seq",))
    snet = ScoreNetwork(_small_cfg(seq_axis="seq"))
    sharded = Sampler(snet, diffuser, cfg, seq_mesh=mesh)

    ts, dt, active = build_schedule(
        np.asarray([0.3, 0.5], np.float32), cfg.num_timesteps, cfg.min_t)
    key = jax.random.PRNGKey(7)
    out_a = plain.run(params, key, feats, ts, dt, active)
    out_b = sharded.run(params, key, feats, ts, dt, active)
    np.testing.assert_allclose(
        np.asarray(out_a["atom37"]), np.asarray(out_b["atom37"]),
        atol=5e-3, err_msg="sharded anneal diverged from unsharded")


def _diffuser():
    import tempfile
    from str2str_tpu.diffusion.se3 import SE3Diffusion
    from str2str_tpu.diffusion.r3 import R3Config, R3Diffusion
    from str2str_tpu.diffusion.so3 import SO3Config, SO3Diffusion
    return SE3Diffusion(
        trans=R3Diffusion(R3Config(coordinate_scaling=0.1)),
        rotation=SO3Diffusion(SO3Config(num_sigma=20, num_omega=50,
                                        n_terms=100,
                                        cache_dir=tempfile.mkdtemp())),
        min_t=1e-2)


def _make_frames(rng, B, L):
    from str2str_tpu.geometry.rotations import quat_to_matrix
    from str2str_tpu.geometry import rotations as R
    quat = np.asarray(R.random_quat(jax.random.PRNGKey(3), (B, L)))
    frames = np.zeros((B, L, 8, 4, 4), np.float32)
    rot = np.asarray(quat_to_matrix(jnp.asarray(quat)))
    frames[..., 0, :3, :3] = rot
    frames[..., 0, 3, 3] = 1.0
    frames[..., 0, :3, 3] = rng.randn(B, L, 3) * 5
    return frames


@pytest.mark.slow
def test_seq_sharded_1024mer_end_to_end(rng):
    """An L=1024 protein — beyond the reference's 500-residue cap — anneals
    end-to-end on the 8-device mesh (memory-path validation; tiny net)."""
    from str2str_tpu.sampling.sampler import Sampler, SamplerConfig, build_schedule

    B, L = 1, 1024
    feats = {k: jnp.asarray(v) for k, v in _batch(rng, B, L).items()}
    feats["rigidgroups_gt_frames"] = jnp.asarray(_make_frames(rng, B, L))

    diffuser = _diffuser()
    cfg = SamplerConfig(num_timesteps=4, replica_per_batch=B)
    devs = np.array(jax.devices()[:8])
    mesh = Mesh(devs, ("seq",))
    snet = ScoreNetwork(_small_cfg(seq_axis="seq"))
    from str2str_tpu.parallel.compat import shard_map
    from jax.sharding import PartitionSpec as P
    init_fn = shard_map(
        lambda b: ScoreNetwork(_small_cfg(seq_axis="seq")).init(
            jax.random.PRNGKey(1), b),
        mesh=mesh, in_specs=(P(),), out_specs=P(), check_rep=False)
    params = init_fn(feats)
    sampler = Sampler(snet, diffuser, cfg, seq_mesh=mesh)

    ts, dt, active = build_schedule(
        np.asarray([0.3], np.float32), cfg.num_timesteps, cfg.min_t)
    out = sampler.run(params, jax.random.PRNGKey(0), feats, ts, dt, active)
    a37 = np.asarray(out["atom37"])
    assert a37.shape == (B, L, 37, 3)
    assert np.isfinite(a37).all()


def test_seq_sharded_kernel_attention_matches_xla(rng):
    """The sequence-sharded trunk with the Pallas kernels forced on
    (interpreted; partial-softmax attention + rectangular edge kernel) must
    match the sharded XLA path on the CPU mesh."""
    import unittest.mock as mock
    from jax.experimental import pallas as pl
    from str2str_tpu.parallel.compat import shard_map
    from jax.sharding import PartitionSpec as P
    from str2str_tpu.ops import ipa_attention as IA

    B, L = 2, 64
    batch = {k: jnp.asarray(v) for k, v in _batch(rng, B, L).items()}

    devs = np.array(jax.devices()[:4])
    mesh = Mesh(devs, ("seq",))

    params = ScoreNetwork(_small_cfg()).init(jax.random.PRNGKey(1), batch)
    net_off = ScoreNetwork(_small_cfg(seq_axis="seq"))
    fn_off = shard_map(lambda p, b: net_off.apply(p, b), mesh=mesh,
                       in_specs=(P(), P()), out_specs=P(), check_rep=False)
    ref = fn_off(params, batch)

    import dataclasses
    net_on = ScoreNetwork(dataclasses.replace(
        _small_cfg(seq_axis="seq"), use_pallas="on", use_pallas_ipa="on"))
    real_call = pl.pallas_call

    def fake_call(*a, **kw):
        kw["interpret"] = True
        return real_call(*a, **kw)

    old = IA._FORCE_QB
    IA._FORCE_QB = 16
    try:
        with mock.patch.object(pl, "pallas_call", fake_call):
            fn_on = shard_map(lambda p, b: net_on.apply(p, b), mesh=mesh,
                              in_specs=(P(), P()), out_specs=P(),
                              check_rep=False)
            out = fn_on(params, batch)
    finally:
        IA._FORCE_QB = old

    m = np.asarray(batch["residue_mask"])[..., None]
    for key in ("quat", "trans", "psi"):
        np.testing.assert_allclose(
            np.asarray(ref[key]) * m, np.asarray(out[key]) * m,
            atol=2e-4, rtol=2e-4, err_msg=key)


def test_seq_sharded_chained_sampler_matches_unsharded(rng):
    """Chained-delta single-program sampling through the sharded trunk ==
    the unsharded chained run, same key."""
    from str2str_tpu.sampling.sampler import (Sampler, SamplerConfig,
                                              build_chained_schedule)

    B, L = 2, 32
    feats = {k: jnp.asarray(v) for k, v in _batch(rng, B, L).items()}
    feats["rigidgroups_gt_frames"] = jnp.asarray(_make_frames(rng, B, L))

    diffuser = _diffuser()
    cfg = SamplerConfig(num_timesteps=10, replica_per_batch=B)

    net = ScoreNetwork(_small_cfg())
    params = net.init(jax.random.PRNGKey(1), feats)
    plain = Sampler(net, diffuser, cfg)

    devs = np.array(jax.devices()[:4])
    mesh = Mesh(devs, ("seq",))
    snet = ScoreNetwork(_small_cfg(seq_axis="seq"))
    sharded = Sampler(snet, diffuser, cfg, seq_mesh=mesh)

    sched, n_slots = build_chained_schedule(
        np.asarray([0.3, 0.5], np.float32), 1, cfg.num_timesteps, cfg.min_t)
    arrs = tuple(jnp.asarray(sched[k])
                 for k in ("ts", "dt", "init", "final", "slot", "local"))
    key = jax.random.PRNGKey(9)
    out_a = plain.run_chained(params, key, feats, n_slots, *arrs)
    out_b = sharded.run_chained(params, key, feats, n_slots, *arrs)
    np.testing.assert_allclose(
        np.asarray(out_a["atom37"]), np.asarray(out_b["atom37"]),
        atol=5e-3, err_msg="sharded chained anneal diverged")
