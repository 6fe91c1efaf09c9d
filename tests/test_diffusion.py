import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from str2str_tpu.diffusion.r3 import R3Config, R3Diffusion
from str2str_tpu.diffusion.se3 import FrameState, SE3Diffusion
from str2str_tpu.diffusion.so3 import SO3Config, SO3Diffusion
from str2str_tpu.geometry import rotations as R

CACHE = tempfile.mkdtemp(prefix="igso3_test_")


@pytest.fixture(scope="module")
def so3():
    return SO3Diffusion(SO3Config(num_sigma=100, num_omega=500, n_terms=1000,
                                  cache_dir=CACHE))


@pytest.fixture(scope="module")
def r3():
    return R3Diffusion(R3Config(coordinate_scaling=0.1))


def test_igso3_pdf_normalized(so3):
    # The marginal angle pdf should integrate to ~1 for every sigma.
    pdf = np.asarray(so3.tables.pdf)
    integral = pdf.sum(-1) * np.pi / pdf.shape[-1]
    np.testing.assert_allclose(integral, 1.0, atol=2e-2)


def test_igso3_sample_distribution(so3):
    # Sampled angles should follow the tabulated CDF (KS-style check).
    key = jax.random.PRNGKey(0)
    t = jnp.full((4,), 0.5)
    samples = so3.sample(key, t, (4, 4000, 3))
    omega = np.linalg.norm(np.asarray(samples), axis=-1).reshape(-1)
    t_idx = int(so3.t_to_idx(jnp.asarray([0.5]))[0])
    cdf = np.asarray(so3.tables.cdf)[t_idx]
    omegas = np.asarray(so3.tables.omegas)
    emp = np.searchsorted(np.sort(omega), omegas) / omega.size
    assert np.abs(emp - cdf).max() < 0.02


def test_so3_score_matches_numerical_gradient(so3):
    # score_norm should equal d/domega log(series(omega)) (finite differences).
    from str2str_tpu.diffusion import igso3
    omega = jnp.linspace(0.3, 2.8, 32)
    sigma = jnp.full((), 0.8)
    h = 1e-3
    f = lambda om: jnp.log(igso3.expansion_jnp(om, sigma))
    num = (f(omega + h) - f(omega - h)) / (2 * h)
    exp_vals = igso3.expansion_jnp(omega, sigma)
    ana = igso3.score_norm_jnp(exp_vals, omega, sigma)
    np.testing.assert_allclose(np.asarray(ana), np.asarray(num), atol=1e-2, rtol=1e-2)


def test_so3_score_series_truncation_exact(so3):
    """The static series truncation (SO3Diffusion._n_terms_eff) must match
    the full 1000-term series to fp32 resolution at every schedule sigma —
    terms past l_max decay as exp(-l(l+1) min_sigma^2/2), far below eps."""
    from str2str_tpu.diffusion import igso3
    n_eff = so3._n_terms_eff()
    assert n_eff < so3.cfg.n_terms  # the truncation is actually active
    omega = jnp.linspace(1e-3, np.pi - 1e-3, 64)
    for sig in (so3.cfg.min_sigma, 0.5, so3.cfg.max_sigma):
        sigma = jnp.full((), sig)
        e_full = np.asarray(igso3.expansion_jnp(omega, sigma, so3.cfg.n_terms))
        e_tr = np.asarray(igso3.expansion_jnp(omega, sigma, n_eff))
        s_full = np.asarray(igso3.score_norm_jnp(
            jnp.asarray(e_full), omega, sigma, so3.cfg.n_terms))
        s_tr = np.asarray(igso3.score_norm_jnp(
            jnp.asarray(e_tr), omega, sigma, n_eff))
        # Truncation error is ~1e-15 relative; the observable tolerance is
        # set by fp32 reduction-order noise (the two sums reduce different
        # lengths), which scales with the series' peak magnitude.
        scale = np.abs(e_full).max()
        np.testing.assert_allclose(e_tr, e_full, atol=1e-6 * scale, rtol=1e-5)
        # Score is only ever evaluated at IGSO3-distributed omegas; compare
        # where the density is non-negligible (elsewhere the +1e-4
        # regularizer divides fp32 noise by fp32 noise).
        live = e_full > 1e-4 * scale
        np.testing.assert_allclose(s_tr[live], s_full[live],
                                   atol=1e-3, rtol=1e-3)


def test_r3_forward_score_is_gaussian_score(r3):
    key = jax.random.PRNGKey(1)
    x0 = jax.random.normal(key, (8, 16, 3)) * 10.0
    t = jnp.full((8,), 0.4)
    x_t, score = r3.forward_marginal(jax.random.PRNGKey(2), x0, t)
    expected = r3.score(r3.scale(x_t), r3.scale(x0), t)
    np.testing.assert_allclose(np.asarray(score), np.asarray(expected), atol=1e-4)


@pytest.mark.slow
def test_se3_forward_score_consistency(so3, r3):
    """Scores returned by forward_marginal must equal SE3Diffusion.score of
    the perturbed state given the clean state."""
    se3 = SE3Diffusion(trans=r3, rotation=so3)
    key = jax.random.PRNGKey(3)
    B, N = 4, 12
    q0 = R.random_quat(jax.random.PRNGKey(4), (B, N))
    tr0 = jax.random.normal(jax.random.PRNGKey(5), (B, N, 3)) * 8
    state0 = FrameState(q0, tr0)
    t = jnp.asarray([0.2, 0.5, 0.8, 1.0])
    out = se3.forward_marginal(key, state0, t)
    rescored = se3.score(state0, out["state_t"], t)
    np.testing.assert_allclose(np.asarray(out["trans_score"]),
                               np.asarray(rescored["trans_score"]), atol=1e-3)
    np.testing.assert_allclose(np.asarray(out["rot_score"]),
                               np.asarray(rescored["rot_score"]),
                               atol=5e-2, rtol=5e-2)


def test_se3_reverse_shapes_and_mask(so3, r3):
    se3 = SE3Diffusion(trans=r3, rotation=so3)
    B, N = 2, 10
    state = FrameState(
        R.random_quat(jax.random.PRNGKey(6), (B, N)),
        jax.random.normal(jax.random.PRNGKey(7), (B, N, 3)),
    )
    rot_score = jnp.ones((B, N, 3))
    trans_score = jnp.ones((B, N, 3))
    t = jnp.full((B,), 0.5)
    mask = jnp.zeros((B, N)).at[:, :5].set(1.0)
    out = se3.reverse(jax.random.PRNGKey(8), state, rot_score, trans_score,
                      t, dt=1e-3, diffuse_mask=mask, center_trans=False)
    # Fixed residues must not move.
    np.testing.assert_allclose(np.asarray(out.quat[:, 5:]), np.asarray(state.quat[:, 5:]))
    np.testing.assert_allclose(np.asarray(out.trans[:, 5:]), np.asarray(state.trans[:, 5:]))
    assert not np.allclose(np.asarray(out.trans[:, :5]), np.asarray(state.trans[:, :5]))


@pytest.mark.slow
def test_reverse_anneal_recovers_structure(so3, r3):
    """Forward-perturb a tiny amount then reverse with the exact score: the
    final state should be closer to the original than the perturbed one."""
    se3 = SE3Diffusion(trans=r3, rotation=so3)
    B, N = 2, 16
    q0 = R.random_quat(jax.random.PRNGKey(9), (B, N))
    tr0 = jax.random.normal(jax.random.PRNGKey(10), (B, N, 3)) * 6
    tr0 = tr0 - tr0.mean(axis=-2, keepdims=True)
    state0 = FrameState(q0, tr0)

    delta = 0.3
    t_arr = jnp.full((B,), delta)
    out = se3.forward_marginal(jax.random.PRNGKey(11), state0, t_arr)
    state = out["state_t"]

    n_steps = 50
    ts = np.linspace(0.01, delta, n_steps)[::-1]
    dt = (delta - 0.01) / n_steps
    for i, tv in enumerate(ts):
        t_i = jnp.full((B,), float(tv))
        scores = se3.score(state0, state, t_i)  # oracle score
        state = se3.reverse(jax.random.PRNGKey(100 + i), state,
                            scores["rot_score"], scores["trans_score"],
                            t_i, dt, probability_flow=True)
    err_before = np.linalg.norm(np.asarray(out["state_t"].trans - tr0), axis=-1).mean()
    err_after = np.linalg.norm(np.asarray(state.trans - tr0), axis=-1).mean()
    assert err_after < 0.7 * err_before


@pytest.mark.parity
def test_parity_so3_schedule_and_tables(so3, reference_available):
    if not reference_available:
        pytest.skip("no reference checkout")
    import torch
    from tests.conftest import load_reference_module
    ref_so3 = load_reference_module("src/models/score/so3.py", "ref_so3")

    ref = ref_so3.SO3Diffuser(cache_dir=CACHE + "/ref", num_sigma=100,
                              num_omega=500, min_sigma=0.1, max_sigma=1.5)
    t = torch.linspace(0.01, 1.0, 10)
    np.testing.assert_allclose(
        np.asarray(so3.sigma(jnp.asarray(t.numpy()))), ref.sigma(t).numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(so3.diffusion_coef(jnp.asarray(t.numpy()))),
        ref.diffusion_coef(t).numpy(), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(so3.tables.cdf), ref._cdf.numpy(), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(so3.tables.score_scaling), ref._score_scaling.numpy(),
        rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(so3.t_to_idx(jnp.asarray(t.numpy()))),
        ref.t_to_idx(t).numpy())


@pytest.mark.parity
def test_parity_so3_score_on_the_fly(so3, rng, reference_available):
    if not reference_available:
        pytest.skip("no reference checkout")
    import torch
    from tests.conftest import load_reference_module
    ref_so3 = load_reference_module("src/models/score/so3.py", "ref_so3")
    ref = ref_so3.SO3Diffuser(cache_dir=CACHE + "/ref", num_sigma=100,
                              num_omega=500)

    # Probe at realistic rotation magnitudes: draw the perturbations from the
    # IGSO(3) itself. (At angles where the density underflows, the 1e-4
    # regularizer makes the "score" fp32 noise in both implementations.)
    t = np.asarray([0.1, 0.4, 0.7, 1.0], dtype=np.float32)
    vec = np.asarray(so3.sample(jax.random.PRNGKey(42), jnp.asarray(t), (4, 8, 3)))
    ref_score = ref.score(torch.tensor(vec), torch.tensor(t)).numpy()
    my_score = np.asarray(so3.score(jnp.asarray(vec), jnp.asarray(t)))
    np.testing.assert_allclose(my_score, ref_score, rtol=2e-3, atol=2e-3)


@pytest.mark.parity
def test_parity_r3(r3, rng, reference_available):
    if not reference_available:
        pytest.skip("no reference checkout")
    import torch
    from tests.conftest import load_reference_module
    ref_r3 = load_reference_module("src/models/score/r3.py", "ref_r3")
    ref = ref_r3.R3Diffuser(coordinate_scaling=0.1)

    x_t = rng.randn(4, 8, 3).astype(np.float32)
    x_0 = rng.randn(4, 8, 3).astype(np.float32)
    t = np.asarray([0.1, 0.4, 0.7, 1.0], dtype=np.float32)
    np.testing.assert_allclose(
        np.asarray(r3.score(jnp.asarray(x_t), jnp.asarray(x_0), jnp.asarray(t), scale=True)),
        ref.score(torch.tensor(x_t), torch.tensor(x_0), torch.tensor(t), scale=True).numpy(),
        atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(r3.score_scaling(jnp.asarray(t))),
        ref.score_scaling(torch.tensor(t)).numpy(), atol=1e-5)
    # Probability-flow reverse step is deterministic -> direct comparison.
    score = rng.randn(4, 8, 3).astype(np.float32)
    mine = r3.reverse(jax.random.PRNGKey(0), jnp.asarray(x_t), jnp.asarray(score),
                      jnp.asarray(t), dt=1e-3, center=True, probability_flow=True)
    theirs = ref.reverse(x_t=torch.tensor(x_t), score_t=torch.tensor(score),
                         t=torch.tensor(t), dt=1e-3, center=True,
                         probability_flow=True).numpy()
    np.testing.assert_allclose(np.asarray(mine), theirs, atol=1e-4)
