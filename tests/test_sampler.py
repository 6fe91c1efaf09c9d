import jax
import jax.numpy as jnp
import numpy as np
import pytest

from str2str_tpu.data.featurize import FeaturizeConfig, featurize_padded
from str2str_tpu.diffusion.r3 import R3Config, R3Diffusion
from str2str_tpu.diffusion.se3 import SE3Diffusion
from str2str_tpu.diffusion.so3 import SO3Config, SO3Diffusion
from str2str_tpu.io import protein as prot_io
from str2str_tpu.model.network import NetworkConfig, ScoreNetwork
from str2str_tpu.sampling.sampler import Sampler, SamplerConfig, build_schedule


@pytest.fixture(scope="module")
def setup(fixture_pdb):
    import tempfile
    prot = prot_io.from_pdb_string(fixture_pdb.read_text())
    feats = featurize_padded(
        prot, FeaturizeConfig(strip_missing_residues=False,
                              recenter_and_scale=False), bucket=16)
    net = ScoreNetwork(NetworkConfig())
    diffuser = SE3Diffusion(
        trans=R3Diffusion(R3Config(coordinate_scaling=0.1)),
        rotation=SO3Diffusion(SO3Config(
            num_sigma=50, num_omega=100, n_terms=300,
            cache_dir=tempfile.mkdtemp())),
        min_t=1e-2)
    batch = {k: jnp.asarray(np.broadcast_to(v, (2,) + v.shape))
             for k, v in feats.items()}
    params = net.init(jax.random.PRNGKey(0), {
        "rigids_t": jnp.tile(jnp.asarray([1., 0, 0, 0, 0, 0, 0]), (2, 16, 1)),
        "t": jnp.ones((2,)) * 0.5,
        "residue_idx": batch["residue_idx"],
        "residue_mask": batch["residue_mask"],
        "fixed_mask": batch["fixed_mask"],
        "sc_ca_t": batch["sc_ca_t"],
        "torsion_angles_sin_cos": batch["torsion_angles_sin_cos"],
        "aatype": batch["aatype"],
    })
    return prot, feats, net, diffuser, params


def test_build_schedule():
    ts, dt, active = build_schedule(np.asarray([0.3, 0.5]), 100, 0.01)
    assert ts.shape == (50, 2)
    # Right-aligned: sample 0 active in the last 30 steps.
    assert float(active[:20, 0].sum()) == 0.0
    assert float(active[20:, 0].sum()) == 30.0
    assert float(active[:, 1].sum()) == 50.0
    # Schedules end at min_t and start at delta.
    np.testing.assert_allclose(np.asarray(ts[-1]), [0.01, 0.01], atol=1e-6)
    np.testing.assert_allclose(np.asarray(ts[0]), [0.3, 0.5], atol=1e-6)
    np.testing.assert_allclose(np.asarray(dt), [1 / 30, 1 / 50], atol=1e-6)


def test_sampler_runs_and_is_finite(setup):
    prot, feats, net, diffuser, params = setup
    sampler = Sampler(net, diffuser, SamplerConfig(num_timesteps=20,
                                                   replica_per_batch=2,
                                                   self_conditioning=True))
    batch = {k: jnp.asarray(np.broadcast_to(v, (2,) + v.shape))
             for k, v in feats.items() if isinstance(v, np.ndarray)}
    ts, dt, active = build_schedule(np.asarray([0.3, 0.5], np.float32), 20, 0.01)
    out = sampler.run(params, jax.random.PRNGKey(1), batch, ts, dt, active)
    atom37 = np.asarray(out["atom37"])
    assert atom37.shape == (2, 16, 37, 3)
    assert np.isfinite(atom37).all()
    # Backbone atoms of real residues are placed.
    mask = np.asarray(out["atom37_mask"])
    assert mask[:, :10, :3].all()


@pytest.mark.slow
def test_sample_ensemble_groups_deltas(setup):
    prot, feats, net, diffuser, params = setup
    sampler = Sampler(net, diffuser, SamplerConfig(
        num_timesteps=20, replica_per_batch=4, n_replica=4,
        delta_min=0.3, delta_max=0.4, delta_step=0.1))
    out = sampler.sample_ensemble(params, jax.random.PRNGKey(2), feats)
    assert set(out.keys()) == {0.3, 0.4}
    for v in out.values():
        assert v.shape == (4, 16, 37, 3)
        assert np.isfinite(v).all()


def test_sampler_determinism(setup):
    """Same key -> identical samples; different key -> different."""
    prot, feats, net, diffuser, params = setup
    sampler = Sampler(net, diffuser, SamplerConfig(num_timesteps=10,
                                                   replica_per_batch=2))
    batch = {k: jnp.asarray(np.broadcast_to(v, (2,) + v.shape))
             for k, v in feats.items() if isinstance(v, np.ndarray)}
    ts, dt, active = build_schedule(np.asarray([0.3, 0.3], np.float32), 10, 0.01)
    o1 = sampler.run(params, jax.random.PRNGKey(7), batch, ts, dt, active)
    o2 = sampler.run(params, jax.random.PRNGKey(7), batch, ts, dt, active)
    o3 = sampler.run(params, jax.random.PRNGKey(8), batch, ts, dt, active)
    np.testing.assert_array_equal(np.asarray(o1["atom37"]), np.asarray(o2["atom37"]))
    assert not np.allclose(np.asarray(o1["atom37"]), np.asarray(o3["atom37"]))


def test_mixed_delta_rows_are_independent(setup):
    """In a mixed-delta batch, each row's trajectory must depend only on its
    own schedule: changing another row's delta must not change this row."""
    prot, feats, net, diffuser, params = setup
    sampler = Sampler(net, diffuser, SamplerConfig(num_timesteps=20,
                                                   replica_per_batch=2))
    batch = {k: jnp.asarray(np.broadcast_to(v, (2,) + v.shape))
             for k, v in feats.items() if isinstance(v, np.ndarray)}
    key = jax.random.PRNGKey(11)
    ts1, dt1, act1 = build_schedule(np.asarray([0.5, 0.3], np.float32), 20, 0.01)
    ts2, dt2, act2 = build_schedule(np.asarray([0.5, 0.45], np.float32), 20, 0.01)
    o1 = sampler.run(params, key, batch, ts1, dt1, act1)
    o2 = sampler.run(params, key, batch, ts2, dt2, act2)
    # Row 0 (same delta, same key) identical; row 1 (different delta) differs.
    np.testing.assert_array_equal(np.asarray(o1["atom37"][0]),
                                  np.asarray(o2["atom37"][0]))
    assert not np.allclose(np.asarray(o1["atom37"][1]), np.asarray(o2["atom37"][1]))


def test_build_chained_schedule():
    from str2str_tpu.sampling.sampler import build_chained_schedule

    sched, n_slots = build_chained_schedule(
        np.asarray([0.3, 0.5]), repeats=2, num_timesteps=100, min_t=0.01)
    # Two repeats of two deltas = 4 segments.
    assert n_slots == 4
    # NFE parity: per segment c+1 net calls (c = int(100*delta)).
    assert sched["ts"].shape[0] == 2 * ((30 + 1) + (50 + 1))
    # First segment: init at delta, reverse steps descending, final at min_t.
    seg0 = sched["ts"][:31]
    assert seg0[0] == np.float32(0.3) and seg0[-1] == np.float32(0.01)
    ref = np.linspace(0.01, 0.3, 30)[::-1]
    np.testing.assert_allclose(seg0[1:30], ref[:-1], atol=1e-6)
    assert sched["init"][0] == 1 and sched["final"][30] == 1
    assert (sched["slot"][:31] == 0).all()
    np.testing.assert_array_equal(sched["local"][:31], np.arange(31))
    np.testing.assert_allclose(sched["dt"][:31], 1 / 30, atol=1e-7)
    # Segment order is delta-major within each repeat.
    assert sched["ts"][31] == np.float32(0.5)
    assert (sched["slot"][-51:] == 3).all()


def test_chained_ensemble_runs_and_groups(setup):
    prot, feats, net, diffuser, params = setup
    sampler = Sampler(net, diffuser, SamplerConfig(
        num_timesteps=20, replica_per_batch=2, n_replica=4,
        delta_min=0.3, delta_max=0.4, delta_step=0.1))
    out = sampler.sample_ensemble_chained(params, jax.random.PRNGKey(3), feats)
    assert set(out.keys()) == {0.3, 0.4}
    for v in out.values():
        assert v.shape == (4, 16, 37, 3)
        assert np.isfinite(v).all()
    # Slots are genuinely distinct samples, not aliases of one buffer write.
    assert not np.allclose(out[0.3][0], out[0.3][1])
    assert not np.allclose(out[0.3][0], out[0.4][0])


@pytest.mark.slow
def test_chained_chunked_dispatch_matches_oneshot(setup):
    """Splitting the chained scan into bounded dispatches (the full-protocol
    chain is ~9.5k steps = one multi-minute device program otherwise) must
    reproduce the one-shot trajectories bitwise: noise keys depend only on
    (slot, local step), never the dispatch boundary."""
    prot, feats, net, diffuser, params = setup
    mk = lambda msd: Sampler(net, diffuser, SamplerConfig(
        num_timesteps=20, replica_per_batch=2, n_replica=4,
        delta_min=0.3, delta_max=0.4, delta_step=0.1,
        max_steps_per_dispatch=msd))
    one = mk(0).sample_ensemble_chained(params, jax.random.PRNGKey(5), feats)
    # 7 does not divide the 32-step chain: exercises the remainder program.
    chk = mk(7).sample_ensemble_chained(params, jax.random.PRNGKey(5), feats)
    assert set(one.keys()) == set(chk.keys())
    for d in one:
        np.testing.assert_array_equal(one[d], chk[d])


@pytest.mark.slow
def test_chained_segments_are_independent(setup):
    """A segment's output must depend only on its own (slot, delta) — not on
    anything annealed before it in the chain (catches state/self-conditioning
    leakage across segment resets)."""
    from str2str_tpu.sampling.sampler import build_chained_schedule

    prot, feats, net, diffuser, params = setup
    sampler = Sampler(net, diffuser, SamplerConfig(num_timesteps=20,
                                                   replica_per_batch=2))
    batch = {k: jnp.asarray(np.broadcast_to(v, (2,) + v.shape))
             for k, v in feats.items() if isinstance(v, np.ndarray)}
    key = jax.random.PRNGKey(5)

    def run(deltas):
        sched, n_slots = build_chained_schedule(
            np.asarray(deltas, np.float32), 1, 20, 0.01)
        return np.asarray(sampler.run_chained(
            params, key, batch, n_slots,
            *(jnp.asarray(sched[k])
              for k in ("ts", "dt", "init", "final", "slot", "local")))["atom37"])

    a = run([0.3, 0.5])
    b = run([0.45, 0.5])
    # Slot 1 (same delta, same slot-keyed noise) is bit-identical even though
    # slot 0's segment differed; slot 0 itself differs.
    np.testing.assert_array_equal(a[1], b[1])
    assert not np.allclose(a[0], b[0])


def _translated_feats(feats, offset):
    """A second 'target': the fixture rigidly translated by `offset` Å."""
    out = {k: np.array(v) for k, v in feats.items() if isinstance(v, np.ndarray)}
    m = out["residue_mask"][:, None] > 0
    out["atom_positions"] = out["atom_positions"] + np.where(
        out["atom_mask"][..., None] > 0, offset, 0.0)
    out["rigidgroups_gt_frames"][..., :3, 3] += np.where(
        out["rigidgroups_gt_exists"][..., None] > 0, offset, 0.0)
    out["pseudo_beta"] += np.where(out["pseudo_beta_mask"][..., None] > 0,
                                   offset, 0.0)
    del m
    return out


@pytest.mark.slow
def test_multi_target_packs_rows_exactly(setup):
    """K=2 targets, one full chunk: sample_ensemble_multi must equal a
    manual run_chained call on the packed [A, A, B, B] batch (pins the
    row-assignment + slot-unpacking contract bit-exactly)."""
    from str2str_tpu.sampling.sampler import build_chained_schedule

    prot, feats, net, diffuser, params = setup
    fa = {k: v for k, v in feats.items() if isinstance(v, np.ndarray)}
    fb = _translated_feats(feats, 5.0)
    cfg = SamplerConfig(num_timesteps=20, replica_per_batch=4, n_replica=2,
                        delta_min=0.3, delta_max=0.4, delta_step=0.1)
    sampler = Sampler(net, diffuser, cfg)
    key = jax.random.PRNGKey(21)
    res = sampler.sample_ensemble_multi(params, key, [fa, fb])

    # Manual equivalent: rows [A, A, B, B], repeats=1, chunk key fold_in(0).
    sched, n_slots = build_chained_schedule(
        np.asarray([0.3, 0.4]), 1, 20, cfg.min_t)
    batch = {k: jnp.asarray(np.stack([fa[k], fa[k], fb[k], fb[k]]))
             for k in fa}
    out = sampler.run_chained(
        params, jax.random.fold_in(key, 0), batch, n_slots,
        *(jnp.asarray(sched[k])
          for k in ("ts", "dt", "init", "final", "slot", "local")))
    atom37 = np.asarray(out["atom37"])  # (2 slots, 4 rows, L, 37, 3)
    for di, d in enumerate([0.3, 0.4]):
        np.testing.assert_array_equal(res[0][d], atom37[di, 0:2])
        np.testing.assert_array_equal(res[1][d], atom37[di, 2:4])


@pytest.mark.slow
def test_multi_target_pads_final_chunk(setup):
    """K=3 targets with rows spanning two chunks (last chunk padded by
    cycling): every target still gets exactly n_replica finite
    conformations per delta, and chunk 2's pad rows are discarded."""
    prot, feats, net, diffuser, params = setup
    fa = {k: v for k, v in feats.items() if isinstance(v, np.ndarray)}
    fb = _translated_feats(feats, 5.0)
    fc = _translated_feats(feats, -5.0)
    cfg = SamplerConfig(num_timesteps=20, replica_per_batch=4, n_replica=2,
                        delta_min=0.3, delta_max=0.3, delta_step=0.1)
    sampler = Sampler(net, diffuser, cfg)
    res = sampler.sample_ensemble_multi(
        params, jax.random.PRNGKey(22), [fa, fb, fc])
    assert len(res) == 3
    for ens in res:
        assert set(ens.keys()) == {0.3}
        assert ens[0.3].shape == (2, 16, 37, 3)
        assert np.isfinite(ens[0.3]).all()
    # Distinct targets: ensembles are not copies of one another.
    assert not np.allclose(res[0][0.3], res[1][0.3])
    assert not np.allclose(res[1][0.3], res[2][0.3])


def test_chained_determinism(setup):
    prot, feats, net, diffuser, params = setup
    sampler = Sampler(net, diffuser, SamplerConfig(
        num_timesteps=10, replica_per_batch=2, n_replica=2,
        delta_min=0.3, delta_max=0.3, delta_step=0.1))
    o1 = sampler.sample_ensemble_chained(params, jax.random.PRNGKey(9), feats)
    o2 = sampler.sample_ensemble_chained(params, jax.random.PRNGKey(9), feats)
    o3 = sampler.sample_ensemble_chained(params, jax.random.PRNGKey(10), feats)
    np.testing.assert_array_equal(o1[0.3], o2[0.3])
    assert not np.allclose(o1[0.3], o3[0.3])


def test_device_batch_cap_logic():
    """auto_batch scales the device batch memory-equivalently (O(B*L^2))
    and is a no-op when disabled or at/above the reference length."""
    c = SamplerConfig(auto_batch_ref_len=128)
    assert c.device_batch_cap(64) == 200      # 50 * (128/64)^2
    assert c.device_batch_cap(128) == 50
    assert c.device_batch_cap(256) == 50      # never below replica_per_batch
    assert SamplerConfig().device_batch_cap(64) == 50  # disabled by default
    big = SamplerConfig(auto_batch_ref_len=512)
    assert big.device_batch_cap(64) == 400    # clamped to auto_batch_max
    assert big.device_batch_cap(64) % 8 == 0


def test_multi_target_auto_batch_shapes(setup):
    """With auto_batch raising the cap, sample_ensemble_multi still returns
    exactly n_replica finite conformations per target per delta."""
    prot, feats, net, diffuser, params = setup
    fa = {k: v for k, v in feats.items() if isinstance(v, np.ndarray)}
    fb = _translated_feats(feats, 5.0)
    cfg = SamplerConfig(num_timesteps=10, replica_per_batch=2, n_replica=3,
                        delta_min=0.3, delta_max=0.4, delta_step=0.1,
                        auto_batch_ref_len=64)  # cap(16) -> clamp at max
    sampler = Sampler(net, diffuser, cfg)
    res = sampler.sample_ensemble_multi(params, jax.random.PRNGKey(3),
                                        [fa, fb])
    assert len(res) == 2
    for per_delta in res:
        assert set(per_delta) == {0.3, 0.4}
        for arr in per_delta.values():
            assert arr.shape == (3, 16, 37, 3)
            assert np.isfinite(arr[:, arr.sum((0, 2, 3)) != 0]).all()
