"""Fused Pallas kernels: equivalence with the XLA path.

On the CPU test platform the kernels run in interpreter mode; the TPU path
is additionally exercised by bench.py / the sampling CLI.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from str2str_tpu.ops import edge_mlp


def _args(rng, B=2, L=32, Cz=16, H=48, Cout=16, dtype=jnp.float32):
    def r(*shape, scale=0.3):
        return jnp.asarray(rng.randn(*shape) * scale, dtype=jnp.float32)

    z = r(B, L, L, Cz).astype(dtype)
    return (z, r(B, L, H), r(B, L, H), r(B, L, Cout), r(B, L, Cout),
            r(Cz, H), r(H, H), r(H, Cout), r(Cz, Cout),
            r(H, scale=0.1), r(H, scale=0.1), r(Cout, scale=0.1),
            jnp.ones(Cout), jnp.zeros(Cout))


def test_edge_mlp_kernel_matches_reference(rng):
    args = _args(rng)
    ref = edge_mlp.edge_mlp_reference(*args)
    # Interpreter mode makes the kernel runnable on CPU.
    import functools
    from jax.experimental import pallas as pl

    with jax.disable_jit(False):
        out = _interpret_pallas(args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def _interpret_pallas(args, **kwargs):
    import unittest.mock as mock
    from jax.experimental import pallas as pl

    real_call = pl.pallas_call

    def fake_call(*a, **kw):
        kw["interpret"] = True
        return real_call(*a, **kw)

    with mock.patch.object(pl, "pallas_call", fake_call):
        return edge_mlp.edge_mlp_pallas(*args, **kwargs)


def test_edge_mlp_int8_dots_close_to_reference(rng):
    """The inference-only int8 MXU path (per-channel weight + per-row
    activation scales) must track the fp32 reference within quantization
    error — |LN output| is O(1), so a broken scale chain shows up as O(1)
    error while healthy int8 sits near ~1e-2."""
    args = _args(rng)
    ref = edge_mlp.edge_mlp_reference(*args)
    out = _interpret_pallas(args, int8_dots=True)
    err = np.abs(np.asarray(out) - np.asarray(ref))
    assert np.isfinite(np.asarray(out)).all()
    assert err.max() < 0.35, err.max()
    assert err.mean() < 0.03, err.mean()

    # proj + proj-only variants run the same int8 body.
    X, Cout = 8, args[7].shape[1]
    wcatT = jnp.asarray(rng.randn(X, Cout) * 0.3, jnp.float32)
    bcat = jnp.asarray(rng.randn(X) * 0.1, jnp.float32)
    out2, proj = _interpret_pallas(args, proj_w=(wcatT, bcat),
                                   int8_dots=True)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out),
                               atol=1e-6, rtol=1e-6)
    proj_only = _interpret_pallas(args, proj_w=(wcatT, bcat),
                                  need_out=False, int8_dots=True)
    np.testing.assert_allclose(np.asarray(proj_only), np.asarray(proj),
                               atol=1e-6, rtol=1e-6)


def test_edge_transition_layer_matches_between_paths(rng):
    """The EdgeTransition flax layer must give identical results with
    use_pallas on (interpreted) and off."""
    from str2str_tpu.model.layers import EdgeTransition

    node = jnp.asarray(rng.randn(2, 16, 32), jnp.float32)
    edge = jnp.asarray(rng.randn(2, 16, 16, 24), jnp.float32)

    off = EdgeTransition(edge_embed_out=24, use_pallas="off")
    params = off.init(jax.random.PRNGKey(0), node, edge)
    out_off = off.apply(params, node, edge)

    on = EdgeTransition(edge_embed_out=24, use_pallas="on")
    import unittest.mock as mock
    from jax.experimental import pallas as pl
    real_call = pl.pallas_call

    def fake_call(*a, **kw):
        kw["interpret"] = True
        return real_call(*a, **kw)

    with mock.patch.object(pl, "pallas_call", fake_call):
        out_on = on.apply(params, node, edge)
    np.testing.assert_allclose(np.asarray(out_off), np.asarray(out_on),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.slow
def test_ipa_attention_kernel_matches_reference(rng):
    from str2str_tpu.ops import ipa_attention as IA

    B, L, H, C, Pq, Pv, Cz = 2, 32, 4, 16, 4, 6, 24
    def r(*s, sc=0.5):
        return jnp.asarray(rng.randn(*s) * sc, jnp.float32)
    mask = np.ones((B, L), np.float32)
    mask[:, -5:] = 0
    args = (r(B, L, H * C), r(B, L, H * C), r(B, L, H * C),
            r(B, L, H * 3 * Pq), r(B, L, H * 3 * Pq), r(B, L, H * 3 * Pv),
            r(B, L, L, Cz), r(Cz, H), r(H, sc=0.1), r(Cz, Cz // 4),
            r(Cz // 4, sc=0.1), jnp.abs(r(H)) + 0.5, jnp.asarray(mask))

    ref = IA.ipa_attention_reference(*args)
    import unittest.mock as mock
    from jax.experimental import pallas as pl
    real_call = pl.pallas_call

    def fake_call(*a, **kw):
        kw["interpret"] = True
        return real_call(*a, **kw)

    with mock.patch.object(pl, "pallas_call", fake_call):
        out = IA.ipa_attention_pallas(*args, query_block=16)
    m = mask[..., None]
    for name, a, b in zip(("o", "opt", "opair"), ref, out):
        np.testing.assert_allclose(np.asarray(a) * m, np.asarray(b) * m,
                                   atol=2e-5, rtol=1e-4, err_msg=name)


@pytest.mark.slow
def test_ipa_attention_packed_matches_reference(rng):
    """Packed-natural kernel (q/k/v DMA'd straight from the packed node
    projection, scale folded into the q lanes) == XLA oracle, forward AND
    gradients (the backward rebuilds head-major operands and reuses the
    hand-written backward kernel)."""
    import math
    import unittest.mock as mock
    from jax.experimental import pallas as pl
    from str2str_tpu.ops import ipa_attention as IA

    B, L, H, C, Pq, Pv, Cz = 2, 32, 4, 16, 4, 6, 24
    def r(*s, sc=0.5):
        return jnp.asarray(rng.randn(*s) * sc, jnp.float32)
    mask = np.ones((B, L), np.float32)
    mask[:, -5:] = 0
    m = jnp.asarray(mask)
    q, k, v = r(B, L, H * C), r(B, L, H * C), r(B, L, H * C)
    qp, kp, vp = r(B, L, H * 3 * Pq), r(B, L, H * 3 * Pq), r(B, L, H * 3 * Pv)
    z, kb, bb = r(B, L, L, Cz), r(Cz, H), r(H, sc=0.1)
    kdz, bdz = r(Cz, Cz // 4), r(Cz // 4, sc=0.1)
    hw = jnp.abs(r(H)) + 0.5

    ref = IA.ipa_attention_reference(q, k, v, qp, kp, vp, z, kb, bb,
                                     kdz, bdz, hw, m)
    scale = math.sqrt(1.0 / (3 * C))
    packed = jnp.concatenate([q * scale, k, v, r(B, L, 40)], -1)

    real_call = pl.pallas_call

    def fake_call(*a, **kw):
        kw["interpret"] = True
        return real_call(*a, **kw)

    prev = IA._FORCE_QB
    IA._FORCE_QB = 16
    try:
        with mock.patch.object(pl, "pallas_call", fake_call):
            out = IA.ipa_attention_packed(packed, qp, kp, vp, z, kb, bb,
                                          kdz, bdz, hw, m, c_hidden=C)
        mm = mask[..., None]
        for name, a, b in zip(("o", "opt", "opair"), ref, out):
            np.testing.assert_allclose(np.asarray(a) * mm, np.asarray(b) * mm,
                                       atol=3e-5, rtol=1e-4, err_msg=name)

        def loss_nat(packed_, qp_, kp_, vp_, z_):
            o, opt, opair = IA.ipa_attention_packed(
                packed_, qp_, kp_, vp_, z_, kb, bb, kdz, bdz, hw, m,
                c_hidden=C)
            w = m[..., None]
            return (jnp.sum((o * w) ** 2) * 0.5
                    + jnp.sum((opt * w) ** 2) * 0.25
                    + jnp.sum((opair * w) ** 2) * 0.125)

        def loss_ref(packed_, qp_, kp_, vp_, z_):
            qq = packed_[..., :H * C] / scale
            kk = packed_[..., H * C:2 * H * C]
            vv = packed_[..., 2 * H * C:3 * H * C]
            o, opt, opair = IA.ipa_attention_reference(
                qq, kk, vv, qp_, kp_, vp_, z_, kb, bb, kdz, bdz, hw, m)
            w = m[..., None]
            return (jnp.sum((o * w) ** 2) * 0.5
                    + jnp.sum((opt * w) ** 2) * 0.25
                    + jnp.sum((opair * w) ** 2) * 0.125)

        with mock.patch.object(pl, "pallas_call", fake_call):
            g_nat = jax.grad(loss_nat, argnums=(0, 1, 2, 3, 4))(
                packed, qp, kp, vp, z)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(
            packed, qp, kp, vp, z)
        for name, a, b in zip(("packed", "qpts", "kpts", "vpts", "z"),
                              g_nat, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-4, rtol=5e-3, err_msg=name)
    finally:
        IA._FORCE_QB = prev


@pytest.mark.slow
def test_ipa_module_paths_match(rng):
    """InvariantPointAttention with use_pallas on (interpreted) == off,
    for real (unmasked) rows."""
    from str2str_tpu.model.ipa import Frames, InvariantPointAttention
    from str2str_tpu.geometry import rotations as R

    B, L = 1, 16
    s = jnp.asarray(rng.randn(B, L, 32), jnp.float32)
    z = jnp.asarray(rng.randn(B, L, L, 16), jnp.float32)
    frames = Frames(
        R.random_quat(jax.random.PRNGKey(0), (B, L)),
        jnp.asarray(rng.randn(B, L, 3) * 4, jnp.float32))
    mask = jnp.ones((B, L))

    kw = dict(c_hidden=16, no_heads=4, no_qk_points=4, no_v_points=6, c_z=16)
    off = InvariantPointAttention(use_pallas="off", **kw)
    params = off.init(jax.random.PRNGKey(1), s, z, frames, mask)
    out_off = off.apply(params, s, z, frames, mask)

    on = InvariantPointAttention(use_pallas="on", **kw)
    import unittest.mock as mock
    from jax.experimental import pallas as pl
    real_call = pl.pallas_call

    def fake_call(*a, **kws):
        kws["interpret"] = True
        return real_call(*a, **kws)

    with mock.patch.object(pl, "pallas_call", fake_call):
        out_on = on.apply(params, s, z, frames, mask)
    np.testing.assert_allclose(np.asarray(out_off), np.asarray(out_on),
                               atol=3e-5, rtol=1e-4)


def _interpret_ctx():
    import unittest.mock as mock
    from jax.experimental import pallas as pl
    real_call = pl.pallas_call

    def fake_call(*a, **kw):
        kw["interpret"] = True
        return real_call(*a, **kw)

    return mock.patch.object(pl, "pallas_call", fake_call)


@pytest.mark.slow
def test_edge_transition_grads_match_between_paths(rng):
    """Training through the fused edge kernel: custom_vjp grads == XLA-path
    grads (the backward differentiates the identical reference math)."""
    from str2str_tpu.model.layers import EdgeTransition

    node = jnp.asarray(rng.randn(1, 12, 32), jnp.float32)
    edge = jnp.asarray(rng.randn(1, 12, 12, 24), jnp.float32)

    off = EdgeTransition(edge_embed_out=24, use_pallas="off")
    params = off.init(jax.random.PRNGKey(0), node, edge)

    def loss(p, mod):
        return jnp.sum(mod.apply(p, node, edge) ** 2)

    g_off = jax.grad(loss)(params, off)
    on = EdgeTransition(edge_embed_out=24, use_pallas="on")
    with _interpret_ctx():
        g_on = jax.grad(loss)(params, on)
    for a, b in zip(jax.tree.leaves(g_off), jax.tree.leaves(g_on)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=3e-4)


@pytest.mark.slow
def test_ipa_grads_match_between_paths(rng):
    """Training through the fused IPA kernel: custom_vjp grads == XLA-path
    grads."""
    from str2str_tpu.model.ipa import Frames, InvariantPointAttention
    from str2str_tpu.geometry import rotations as R

    B, L = 1, 16
    s = jnp.asarray(rng.randn(B, L, 32), jnp.float32)
    z = jnp.asarray(rng.randn(B, L, L, 16), jnp.float32)
    frames = Frames(
        R.random_quat(jax.random.PRNGKey(0), (B, L)),
        jnp.asarray(rng.randn(B, L, 3) * 4, jnp.float32))
    mask = jnp.ones((B, L))

    kw = dict(c_hidden=16, no_heads=4, no_qk_points=4, no_v_points=6, c_z=16)
    off = InvariantPointAttention(use_pallas="off", **kw)
    params = off.init(jax.random.PRNGKey(1), s, z, frames, mask)

    def loss(p, mod):
        return jnp.sum(mod.apply(p, s, z, frames, mask) ** 2)

    g_off = jax.grad(loss)(params, off)
    on = InvariantPointAttention(use_pallas="on", **kw)
    with _interpret_ctx():
        g_on = jax.grad(loss)(params, on)
    for a, b in zip(jax.tree.leaves(g_off), jax.tree.leaves(g_on)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=3e-4)


def test_ipa_grads_bf16_mixed_inputs(rng):
    """Regression: in bf16 mode the module passes fp32 point tensors with
    bf16 scalar q/k/v; the custom_vjp backward must handle the oracle's
    promoted output dtypes (crashed with a cotangent dtype mismatch)."""
    from str2str_tpu.ops import ipa_attention as IA

    B, L, H, C, Pq, Pv, Cz = 1, 16, 4, 16, 4, 6, 24

    def r(*s, dt=jnp.float32, sc=0.5):
        return jnp.asarray(rng.randn(*s) * sc, dt)

    bf = jnp.bfloat16
    args = (r(B, L, H * C, dt=bf), r(B, L, H * C, dt=bf), r(B, L, H * C, dt=bf),
            r(B, L, H * 3 * Pq), r(B, L, H * 3 * Pq), r(B, L, H * 3 * Pv),
            r(B, L, L, Cz, dt=bf), r(Cz, H), r(H, sc=0.1), r(Cz, Cz // 4),
            r(Cz // 4, sc=0.1), jnp.abs(r(H)) + 0.5, jnp.ones((B, L)))

    def loss(q):
        with _interpret_ctx():
            o, opt, opair = IA.ipa_attention(q, *args[1:])
        return (jnp.sum(o.astype(jnp.float32) ** 2)
                + jnp.sum(opt.astype(jnp.float32) ** 2)
                + jnp.sum(opair.astype(jnp.float32) ** 2))

    g = jax.grad(loss)(args[0])
    assert np.isfinite(np.asarray(g, np.float32)).all()


@pytest.mark.slow
def test_ipa_backward_kernel_matches_oracle_grads(rng):
    """The hand-written Pallas backward kernel (recompute-softmax, fp32
    accumulators) must reproduce the XLA oracle's gradients for every
    differentiable input."""
    from str2str_tpu.ops import ipa_attention as IA

    B, L, H, C, Pq, Pv, Cz = 2, 32, 4, 16, 4, 6, 24

    def r(*s, sc=0.5):
        return jnp.asarray(rng.randn(*s) * sc, jnp.float32)

    mask = np.ones((B, L), np.float32)
    mask[:, -5:] = 0
    args = (r(B, L, H * C), r(B, L, H * C), r(B, L, H * C),
            r(B, L, H * 3 * Pq), r(B, L, H * 3 * Pq), r(B, L, H * 3 * Pv),
            r(B, L, L, Cz), r(Cz, H), r(H, sc=0.1), r(Cz, Cz // 4),
            r(Cz // 4, sc=0.1), jnp.abs(r(H)) + 0.5, jnp.asarray(mask))
    m3 = jnp.asarray(mask)[..., None]

    def loss(fn, *a):
        o, opt, opair = fn(*a)
        return (jnp.sum((o * m3) ** 2) + jnp.sum((opt * m3) ** 2)
                + jnp.sum((opair * m3) ** 3))

    argnums = tuple(range(12))
    g_ref = jax.grad(lambda *a: loss(IA.ipa_attention_reference, *a),
                     argnums)(*args)
    old = IA._FORCE_QB
    IA._FORCE_QB = 16
    try:
        with _interpret_ctx():
            g_k = jax.grad(lambda *a: loss(IA.ipa_attention, *a),
                           argnums)(*args)
    finally:
        IA._FORCE_QB = old
    for i, (a, b) in enumerate(zip(g_ref, g_k)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4,
                                   err_msg=f"grad argnum {i}")


@pytest.mark.slow
def test_edge_mlp_backward_kernel_matches_oracle_grads(rng):
    from str2str_tpu.ops import edge_mlp as EM

    B, L, Cz, H, Cout = 2, 32, 16, 48, 16

    def r(*shape, scale=0.3):
        return jnp.asarray(rng.randn(*shape) * scale, dtype=jnp.float32)

    args = (r(B, L, L, Cz), r(B, L, H), r(B, L, H), r(B, L, Cout),
            r(B, L, Cout), r(Cz, H), r(H, H), r(H, Cout), r(Cz, Cout),
            r(H, scale=0.1), r(H, scale=0.1), r(Cout, scale=0.1),
            jnp.ones(Cout) + r(Cout, scale=0.05), r(Cout, scale=0.05))
    w = r(B, L, L, Cout)

    def loss(fn, *a):
        o = fn(*a)
        return jnp.sum(o * w + 0.3 * o ** 2)

    argnums = tuple(range(14))
    g_ref = jax.grad(lambda *a: loss(EM.edge_mlp_reference, *a),
                     argnums)(*args)
    with _interpret_ctx():
        g_k = jax.grad(lambda *a: loss(EM.edge_mlp, *a), argnums)(*args)
    for i, (a, b) in enumerate(zip(g_ref, g_k)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3,
                                   err_msg=f"grad argnum {i}")


def test_edge_mlp_bwd_picker_envelope():
    """The backward row-block picker must admit the production shapes and
    return None (-> XLA-VJP fallback) when even rb=8 exceeds the raised
    scoped-VMEM limit, instead of forcing a Mosaic compile failure."""
    from str2str_tpu.ops.edge_mlp import _pick_bwd_row_block

    # Headline shape (L=256, c_z=128, hidden 384, bf16): must run the kernel.
    assert _pick_bwd_row_block(256, 256, 128, 384, 128, 2) is not None
    assert _pick_bwd_row_block(512, 512, 128, 384, 128, 2) is not None
    # Unsharded L=1024: rb=8 working set exceeds the limit -> fallback.
    assert _pick_bwd_row_block(1024, 1024, 128, 384, 128, 2) is None


def test_edge_mlp_bwd_vmem_fallback_matches_reference(rng, monkeypatch):
    """When the backward kernel declines (working set > scoped VMEM), the
    custom_vjp must differentiate the XLA reference instead of crashing."""
    from str2str_tpu.ops import edge_mlp as EM

    args = _args(rng)
    w = jnp.asarray(rng.randn(2, 32, 32, 16) * 0.3, jnp.float32)

    def loss(fn, *a):
        o = fn(*a)
        return jnp.sum(o * w + 0.3 * o ** 2)

    argnums = tuple(range(14))
    g_ref = jax.grad(lambda *a: loss(EM.edge_mlp_reference, *a),
                     argnums)(*args)
    monkeypatch.setattr(EM, "edge_mlp_bwd_pallas", lambda *a, **k: None)
    with _interpret_ctx():
        g_k = jax.grad(lambda *a: loss(EM.edge_mlp, *a), argnums)(*args)
    for i, (a, b) in enumerate(zip(g_ref, g_k)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3,
                                   err_msg=f"grad argnum {i}")


@pytest.mark.slow
def test_edge_mlp_proj_only_matches_oracle(rng):
    """The proj-only variant (last EdgeTransition: dead z' write skipped)
    must match the oracle's proj output and grads."""
    from str2str_tpu.ops import edge_mlp as EM

    B, L, Cz, H, Cout, X = 2, 32, 16, 48, 16, 8

    def r(*shape, scale=0.3):
        return jnp.asarray(rng.randn(*shape) * scale, dtype=jnp.float32)

    args = (r(B, L, L, Cz), r(B, L, H), r(B, L, H), r(B, L, Cout),
            r(B, L, Cout), r(Cz, H), r(H, H), r(H, Cout), r(Cz, Cout),
            r(H, scale=0.1), r(H, scale=0.1), r(Cout, scale=0.1),
            jnp.ones(Cout) + r(Cout, scale=0.05), r(Cout, scale=0.05),
            r(X, Cout), r(X, scale=0.1))

    ref = EM.edge_mlp_proj_only_reference(*args)
    with _interpret_ctx():
        out = EM.edge_mlp_pallas(*args[:14], proj_w=(args[14], args[15]),
                                 need_out=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

    w = r(B, L, X, L)

    def loss(fn, *a):
        p = fn(*a)
        return jnp.sum(p * w + 0.3 * p ** 2)

    argnums = tuple(range(16))
    g_ref = jax.grad(lambda *a: loss(EM.edge_mlp_proj_only_reference, *a),
                     argnums)(*args)
    with _interpret_ctx():
        g_k = jax.grad(lambda *a: loss(EM.edge_mlp_proj_only, *a),
                       argnums)(*args)
    for i, (a, b) in enumerate(zip(g_ref, g_k)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3,
                                   err_msg=f"grad argnum {i}")


@pytest.mark.slow
def test_edge_embed_backward_kernel_matches_oracle_grads(rng):
    from str2str_tpu.ops import edge_embed as EE

    B, L, D, NB, ies = 2, 32, 24, 22, 16
    PE = ies

    def r(*shape, scale=0.3):
        return jnp.asarray(rng.randn(*shape) * scale, dtype=jnp.float32)

    residue_idx = jnp.asarray(np.arange(L)[None, :].repeat(B, 0), jnp.int32)
    args = (r(B, L, D), r(B, L, D), residue_idx, r(B, L, 3, scale=3.0),
            r(PE, D), r(NB, D), r(D, D), r(D, D),
            r(D, scale=0.1), r(D, scale=0.1), r(D, scale=0.1),
            jnp.ones(D) + r(D, scale=0.05), r(D, scale=0.05))
    kw = dict(min_bin=1e-5, max_bin=20.0, num_bins=NB,
              init_embed_size=ies, max_len=2056, self_conditioning=True)
    w = r(B, L, L, D)

    def loss_ref(*a):
        o = EE.edge_embed_reference(*a, **kw)
        return jnp.sum(o * w + 0.3 * o ** 2)

    def loss_kern(*a):
        o = EE.edge_embed(*a, kw["min_bin"], kw["max_bin"], kw["num_bins"],
                          kw["init_embed_size"], kw["max_len"],
                          kw["self_conditioning"])
        return jnp.sum(o * w + 0.3 * o ** 2)

    argnums = (0, 1, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12)
    g_ref = jax.grad(loss_ref, argnums)(*args)
    old = EE._FORCE_QB
    EE._FORCE_QB = 16
    try:
        with _interpret_ctx():
            g_k = jax.grad(loss_kern, argnums)(*args)
    finally:
        EE._FORCE_QB = old
    for i, (a, b) in enumerate(zip(g_ref, g_k)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=2e-3,
                                   err_msg=f"grad argnum {i}")


@pytest.mark.slow
def test_trunk_mega_fusion_matches_xla_paths(rng):
    """Edge-stack mega-fusion (EdgeTransition kernel emits the next block's
    fused z projection; attention consumes it without reading z): trunk
    forward AND grads match the plain XLA path."""
    from str2str_tpu.model.ipa import TranslationIPA
    from str2str_tpu.ops import ipa_attention as IA
    from str2str_tpu.geometry import rotations as R

    B, L, cs, cz = 1, 16, 32, 16
    node = jnp.asarray(rng.randn(B, L, cs), jnp.float32)
    edge = jnp.asarray(rng.randn(B, L, L, cz), jnp.float32)
    rig = np.zeros((B, L, 7), np.float32)
    rig[..., :4] = np.asarray(R.random_quat(jax.random.PRNGKey(0), (B, L)))
    rig[..., 4:] = rng.randn(B, L, 3) * 4
    rig = jnp.asarray(rig)
    mask = np.ones((B, L), np.float32)
    mask[:, -3:] = 0
    mask = jnp.asarray(mask)
    fixed = jnp.zeros((B, L), jnp.float32)
    m = np.asarray(mask)[..., None]

    kw = dict(c_s=cs, c_z=cz, no_ipa_blocks=3, skip_embed_size=8,
              transformer_num_heads=2, transformer_num_layers=1,
              c_hidden=16, no_heads=4, no_qk_points=4, no_v_points=6,
              dropout=0.0)
    off = TranslationIPA(use_pallas="off", use_pallas_ipa="off", **kw)
    params = off.init(jax.random.PRNGKey(1), node, edge, rig, mask, fixed)
    on = TranslationIPA(use_pallas="on", use_pallas_ipa="on", **kw)

    def loss(p, mod):
        out = mod.apply(p, node, edge, rig, mask, fixed)
        return (jnp.sum((out["trans"] * m) ** 2) * 1e-4
                + jnp.sum((out["quat"] * m) ** 2)
                + jnp.sum((out["psi"] * m) ** 2))

    out_off = off.apply(params, node, edge, rig, mask, fixed)
    g_off = jax.grad(loss)(params, off)
    old = IA._FORCE_QB
    IA._FORCE_QB = 8
    try:
        with _interpret_ctx():
            out_on = on.apply(params, node, edge, rig, mask, fixed)
            g_on = jax.grad(loss)(params, on)
    finally:
        IA._FORCE_QB = old

    for key in ("quat", "trans", "psi"):
        np.testing.assert_allclose(
            np.asarray(out_off[key]) * m, np.asarray(out_on[key]) * m,
            atol=5e-4, rtol=5e-4, err_msg=key)
    for (k1, a), (k2, b) in zip(
            jax.tree_util.tree_flatten_with_path(g_off)[0],
            jax.tree_util.tree_flatten_with_path(g_on)[0]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-2,
            err_msg=jax.tree_util.keystr(k1))


@pytest.mark.slow
def test_network_mega_fusion_matches_xla_paths(rng):
    """Full ScoreNetwork with ALL kernels on (interpreted), including the
    block-0 embedder-proj mega-fusion, must match the XLA-path network on
    valid (unmasked) rows — forward and grads."""
    from str2str_tpu.model.network import NetworkConfig, ScoreNetwork
    from str2str_tpu.ops import ipa_attention as IA
    from str2str_tpu.ops import edge_embed as EE
    from str2str_tpu.geometry import rotations as R

    B, L = 1, 16
    quat = np.asarray(R.random_quat(jax.random.PRNGKey(0), (B, L)))
    mask = np.ones((B, L), np.float32)
    mask[:, -3:] = 0
    batch = {
        "rigids_t": jnp.asarray(np.concatenate(
            [quat, rng.randn(B, L, 3).astype(np.float32) * 4], -1)),
        "t": jnp.full((B,), 0.4),
        "residue_idx": jnp.asarray(np.tile(np.arange(L, dtype=np.int32),
                                           (B, 1))),
        "residue_mask": jnp.asarray(mask),
        "fixed_mask": jnp.zeros((B, L)),
        "sc_ca_t": jnp.asarray(rng.randn(B, L, 3).astype(np.float32)),
        "torsion_angles_sin_cos": jnp.asarray(
            rng.randn(B, L, 7, 2).astype(np.float32)),
        "aatype": jnp.zeros((B, L), jnp.int32),
    }
    kw = dict(init_embed_size=8, node_embed_size=32, edge_embed_size=16,
              no_ipa_blocks=2, skip_embed_size=8, transformer_num_heads=2,
              transformer_num_layers=1, c_hidden=16, no_heads=4,
              no_qk_points=4, no_v_points=6, dropout=0.0)
    off = ScoreNetwork(NetworkConfig(use_pallas="off", use_pallas_ipa="off",
                                     **kw))
    params = off.init(jax.random.PRNGKey(1), batch)
    on = ScoreNetwork(NetworkConfig(use_pallas="on", use_pallas_ipa="on",
                                    **kw))
    m = mask[..., None]

    def loss(p, mod):
        out = mod.apply(p, batch)
        return (jnp.sum((out["trans"] * m) ** 2) * 1e-4
                + jnp.sum((out["psi"] * m) ** 2))

    out_off = off.apply(params, batch)
    g_off = jax.grad(loss)(params, off)
    oia, oee = IA._FORCE_QB, EE._FORCE_QB
    IA._FORCE_QB = EE._FORCE_QB = 8
    try:
        with _interpret_ctx():
            out_on = on.apply(params, batch)
            g_on = jax.grad(loss)(params, on)
    finally:
        IA._FORCE_QB, EE._FORCE_QB = oia, oee

    for key in ("quat", "trans", "psi"):
        np.testing.assert_allclose(
            np.asarray(out_off[key]) * m, np.asarray(out_on[key]) * m,
            atol=1e-3, rtol=1e-3, err_msg=key)
    for (k1, a), (k2, b) in zip(
            jax.tree_util.tree_flatten_with_path(g_off)[0],
            jax.tree_util.tree_flatten_with_path(g_on)[0]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-3, rtol=1e-2,
            err_msg=jax.tree_util.keystr(k1))


def test_edge_mlp_kernel_rectangular_matches_reference(rng):
    """Rectangular (rows != cols) inputs: the sequence-sharded trunk calls
    the kernel with each device's column shard (B, Lr, Lc, Cz)."""
    from str2str_tpu.ops import edge_mlp as EM

    B, Lr, Lc, Cz, H, Cout = 2, 32, 16, 16, 48, 16

    def r(*shape, scale=0.3):
        return jnp.asarray(rng.randn(*shape) * scale, dtype=jnp.float32)

    args = (r(B, Lr, Lc, Cz), r(B, Lr, H), r(B, Lc, H), r(B, Lr, Cout),
            r(B, Lc, Cout), r(Cz, H), r(H, H), r(H, Cout), r(Cz, Cout),
            r(H, scale=0.1), r(H, scale=0.1), r(Cout, scale=0.1),
            jnp.ones(Cout), jnp.zeros(Cout))
    ref = EM.edge_mlp_reference(*args)
    assert ref.shape == (B, Lr, Lc, Cout)
    with _interpret_ctx():
        out = EM.edge_mlp_pallas(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

    # Backward too (the training path under the sharded trunk).
    w = r(B, Lr, Lc, Cout)

    def loss(fn, *a):
        o = fn(*a)
        return jnp.sum(o * w + 0.3 * o ** 2)

    argnums = tuple(range(14))
    g_ref = jax.grad(lambda *a: loss(EM.edge_mlp_reference, *a),
                     argnums)(*args)
    with _interpret_ctx():
        g_k = jax.grad(lambda *a: loss(EM.edge_mlp, *a), argnums)(*args)
    for i, (a, b) in enumerate(zip(g_ref, g_k)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3,
                                   err_msg=f"grad argnum {i}")


@pytest.mark.slow
def test_seq_sharded_trunk_kernel_path_matches_xla(rng):
    """The sequence-sharded EdgeTransition with the Pallas kernel forced on
    (interpreted) must match the XLA path on the same column shard."""
    from str2str_tpu.model.layers import EdgeTransition

    node = jnp.asarray(rng.randn(2, 16, 32), jnp.float32)
    edge_local = jnp.asarray(rng.randn(2, 16, 16, 24), jnp.float32)

    import unittest.mock as mock
    from unittest.mock import patch
    from jax.experimental import pallas as pl
    from str2str_tpu.parallel.compat import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    devs = np.array(jax.devices()[:2])
    mesh = Mesh(devs, ("seq",))

    def run(use_pallas):
        layer = EdgeTransition(edge_embed_out=24, use_pallas=use_pallas,
                               seq_axis="seq")

        def body(n, e):
            params = layer.init(jax.random.PRNGKey(0), n, e)
            return layer.apply(params, n, e)

        fn = shard_map(body, mesh=mesh,
                       in_specs=(P(), P(None, None, "seq", None)),
                       out_specs=P(None, None, "seq", None),
                       check_rep=False)
        return fn(node, edge_local)

    out_off = run("off")
    real_call = pl.pallas_call

    def fake_call(*a, **kw):
        kw["interpret"] = True
        return real_call(*a, **kw)

    with mock.patch.object(pl, "pallas_call", fake_call):
        out_on = run("on")
    np.testing.assert_allclose(np.asarray(out_on), np.asarray(out_off),
                               atol=2e-5, rtol=2e-5)


def test_edge_embed_kernel_rectangular_matches_reference(rng):
    """Rectangular (rows != cols) embedder block: the sequence-sharded
    trunk embeds (B, Lr, Lc) with column-side inputs from the local shard
    (edge_embed_cols / edge_embed_pallas residue_idx_col, sc_ca_col)."""
    from str2str_tpu.ops import edge_embed as EE

    B, Lr, Lc, D, NB, ies = 2, 32, 16, 24, 22, 16
    PE = ies

    def r(*shape, scale=0.3):
        return jnp.asarray(rng.randn(*shape) * scale, dtype=jnp.float32)

    idx_r = jnp.asarray(np.arange(Lr)[None, :].repeat(B, 0), jnp.int32)
    idx_c = jnp.asarray((np.arange(Lc) + 7)[None, :].repeat(B, 0), jnp.int32)
    sc_r, sc_c = r(B, Lr, 3, scale=3.0), r(B, Lc, 3, scale=3.0)
    row, col = r(B, Lr, D), r(B, Lc, D)
    weights = (r(PE, D), r(NB, D), r(D, D), r(D, D),
               r(D, scale=0.1), r(D, scale=0.1), r(D, scale=0.1),
               jnp.ones(D), jnp.zeros(D))
    kw = dict(min_bin=1e-5, max_bin=20.0, num_bins=NB,
              init_embed_size=ies, max_len=2056, self_conditioning=True)

    ref = EE.edge_embed_reference(row, col, idx_r, sc_r, *weights,
                                  residue_idx_col=idx_c, sc_ca_col=sc_c, **kw)
    assert ref.shape == (B, Lr, Lc, D)
    with _interpret_ctx():
        out = EE.edge_embed_pallas(row, col, idx_r, sc_r, *weights,
                                   query_block=8, residue_idx_col=idx_c,
                                   sc_ca_col=sc_c, **kw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

    # The differentiable wrapper: grads of the rectangular entry match the
    # reference's autodiff (backward differentiates the reference).
    w = r(B, Lr, Lc, D)

    def loss_ref(row, col, sc_r, sc_c, k1):
        o = EE.edge_embed_reference(
            row, col, idx_r, sc_r, weights[0], weights[1], k1, weights[3],
            *weights[4:], residue_idx_col=idx_c, sc_ca_col=sc_c, **kw)
        return jnp.sum(o * w)

    def loss_cols(row, col, sc_r, sc_c, k1):
        o = EE.edge_embed_cols(
            row, col, idx_r, sc_r, idx_c, sc_c,
            weights[0], weights[1], k1, weights[3], *weights[4:],
            kw["min_bin"], kw["max_bin"], kw["num_bins"],
            kw["init_embed_size"], kw["max_len"], kw["self_conditioning"])
        return jnp.sum(o * w)

    argnums = (0, 1, 2, 3, 4)
    g_ref = jax.grad(loss_ref, argnums)(row, col, sc_r, sc_c, weights[2])
    with _interpret_ctx():
        g_k = jax.grad(loss_cols, argnums)(row, col, sc_r, sc_c, weights[2])
    for i, (a, b) in enumerate(zip(g_ref, g_k)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4,
                                   err_msg=f"grad argnum {i}")


# ---------------------------------------------------------------------------
# Fast-tier kernel smokes (round-4 advice): one CHEAP interpreted-mode
# forward-parity test per rewritten kernel, so a plain `pytest` run (slow
# marker deselected) still exercises every kernel path. The heavy parity /
# gradient tests above stay in the slow tier (`make test-all`).


def test_ipa_attention_packed_fast_smoke(rng):
    """Tiny-shape packed-natural IPA kernel == XLA oracle (forward only)."""
    import math
    from str2str_tpu.ops import ipa_attention as IA

    B, L, H, C, Pq, Pv, Cz = 1, 16, 2, 8, 2, 3, 8

    def r(*s, sc=0.5):
        return jnp.asarray(rng.randn(*s) * sc, jnp.float32)

    mask = np.ones((B, L), np.float32)
    mask[:, -3:] = 0
    m = jnp.asarray(mask)
    q, k, v = r(B, L, H * C), r(B, L, H * C), r(B, L, H * C)
    qp, kp, vp = r(B, L, H * 3 * Pq), r(B, L, H * 3 * Pq), r(B, L, H * 3 * Pv)
    z, kb, bb = r(B, L, L, Cz), r(Cz, H), r(H, sc=0.1)
    kdz, bdz = r(Cz, Cz // 4), r(Cz // 4, sc=0.1)
    hw = jnp.abs(r(H)) + 0.5

    ref = IA.ipa_attention_reference(q, k, v, qp, kp, vp, z, kb, bb,
                                     kdz, bdz, hw, m)
    packed = jnp.concatenate([q * math.sqrt(1.0 / (3 * C)), k, v], -1)
    prev = IA._FORCE_QB
    IA._FORCE_QB = 8
    try:
        with _interpret_ctx():
            out = IA.ipa_attention_packed(packed, qp, kp, vp, z, kb, bb,
                                          kdz, bdz, hw, m, c_hidden=C)
    finally:
        IA._FORCE_QB = prev
    mm = mask[..., None]
    for name, a, b in zip(("o", "opt", "opair"), ref, out):
        np.testing.assert_allclose(np.asarray(a) * mm, np.asarray(b) * mm,
                                   atol=3e-5, rtol=1e-4, err_msg=name)


def test_edge_embed_kernel_fast_smoke(rng):
    """Tiny-shape square embedder kernel (with block-0 proj emission) ==
    XLA reference."""
    from str2str_tpu.ops import edge_embed as EE

    B, L, D, NB, ies, X = 1, 16, 16, 8, 8, 4

    def r(*shape, scale=0.3):
        return jnp.asarray(rng.randn(*shape) * scale, dtype=jnp.float32)

    idx = jnp.asarray(np.arange(L)[None, :].repeat(B, 0), jnp.int32)
    sc = r(B, L, 3, scale=3.0)
    row, col = r(B, L, D), r(B, L, D)
    weights = (r(ies, D), r(NB, D), r(D, D), r(D, D),
               r(D, scale=0.1), r(D, scale=0.1), r(D, scale=0.1),
               jnp.ones(D), jnp.zeros(D))
    kw = dict(min_bin=1e-5, max_bin=20.0, num_bins=NB,
              init_embed_size=ies, max_len=64, self_conditioning=True)
    wcatT, bcat = r(X, D), r(X, scale=0.1)

    ref = EE.edge_embed_reference(row, col, idx, sc, *weights, **kw)
    ref_proj = (jnp.einsum("bilc,xc->bixl", ref, wcatT)
                + bcat[None, None, :, None])
    with _interpret_ctx():
        z0, proj = EE.edge_embed_pallas(row, col, idx, sc, *weights,
                                        query_block=8,
                                        proj_w=(wcatT, bcat), **kw)
    np.testing.assert_allclose(np.asarray(z0), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(proj), np.asarray(ref_proj),
                               atol=2e-4, rtol=2e-4)
