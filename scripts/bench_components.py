#!/usr/bin/env python
"""Slope-time every forward component of the score network at the headline
shape, to map where the per-forward milliseconds go (and how far each
component sits from its byte/FLOP floor).

Methodology = scripts/bench_ipa_kernel.py: chain iterations through a data
dependency in one jitted `lax.scan`, carry the component's dominant operand
so nothing operand-sized is hoisted, run two scan lengths and report
(t_long - t_short) / (n_long - n_short).

Components (production configuration — mega-fusion kernels):
  embed+proj   edge-embedder kernel emitting z0 AND ipa_0's fused proj
  edgemlp+proj EdgeTransition kernel emitting z' AND the next block's proj
  ipa(mega)    fused IPA attention consuming proj (z never read)
  ipa prep+out XLA side of the IPA module around the core (q/k/v packing,
               frames rotation, inverse frames, concat, linear_out)
  transformer  one skip-concat 2-layer transformer block (B, L, 320)
  node tail    NodeTransition + BackboneUpdate + quat update + torsion head
  full fwd     the whole ScoreNetwork forward (same params/dtype)
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from str2str_tpu.utils.jax_setup import setup as _jax_setup
_jax_setup()

import jax
import jax.numpy as jnp


def slope_time(make_step, carries, n_short=20, n_long=80):
    """make_step: (carry_tuple) -> new carry_tuple (data-dependent)."""
    def total_ms(iters):
        @jax.jit
        def chained(*c0):
            def step(c, _):
                return make_step(*c), ()
            cf, _ = jax.lax.scan(step, c0, None, length=iters)
            return sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(cf))

        warm = tuple(c + jnp.asarray(1.0, c.dtype) if c.dtype != jnp.int32 else c
                     for c in carries)
        float(chained(*warm))
        t0 = time.perf_counter()
        float(chained(*carries))
        return (time.perf_counter() - t0) * 1e3

    return (total_ms(n_long) - total_ms(n_short)) / (n_long - n_short)


def fold(carry, *outs):
    """One-element in-place carry perturbation: defeats loop hoisting and
    service memoization while adding ~zero HBM traffic. (The earlier
    full-tensor `carry + sum(out)*1e-12` read every output AND re-wrote the
    whole carry each iteration — a constant ~0.1-0.6 ms/iter of harness
    traffic that inflated every component number; see BASELINE.md.) The
    barrier forces full materialization of XLA-computed outputs that would
    otherwise be DCE'd down to the one element read."""
    outs = jax.lax.optimization_barrier(outs)
    bump = sum(o.reshape(-1)[0].astype(jnp.float32) for o in outs)
    flat = carry.reshape(-1)
    flat = jax.lax.dynamic_update_slice(
        flat, flat[:1] + (bump * 1e-12).astype(carry.dtype), (0,))
    return flat.reshape(carry.shape)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=8)
    ap.add_argument("--L", type=int, default=256)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--bwd", action="store_true",
                    help="also time kernel fwd+bwd (training path)")
    ap.add_argument("--int8", action="store_true",
                    help="run the EdgeTransition dots on the int8 MXU path "
                         "(inference-only; model.net.edge_dots_int8)")
    ns = ap.parse_args()
    B, L = ns.B, ns.L
    dt = jnp.dtype(ns.dtype)
    print(f"device: {jax.devices()[0].platform}, B={B} L={L} {dt.name}")

    key = jax.random.PRNGKey(0)
    ks = iter(jax.random.split(key, 64))
    rnd = lambda *s, d=dt: (jax.random.normal(next(ks), s, jnp.float32) * 0.1).astype(d)

    c_s, c_z, H, C, Pq, Pv = 256, 128, 8, 256, 8, 12
    Cdz = c_z // 4
    X = Cdz + H
    rows = {}

    # ---- edge embedder (+ block-0 proj) --------------------------------
    from str2str_tpu.ops import edge_embed as EE
    D = c_z
    row_part, col_part = rnd(B, L, D), rnd(B, L, D)
    ridx = jnp.tile(jnp.arange(L, dtype=jnp.int32)[None], (B, 1))
    sc_ca = rnd(B, L, 3, d=jnp.float32)
    ee_w = dict(krel=rnd(32, D), kd=rnd(22, D), k1=rnd(D, D), k2=rnd(D, D),
                b0=rnd(D), b1=rnd(D), b2=rnd(D),
                ln_scale=rnd(D), ln_bias=rnd(D))
    wcatT, bcat = rnd(X, D), rnd(X, d=jnp.float32)

    def embed_step(rp):
        z0, proj = EE.edge_embed_pallas(
            rp, col_part, ridx, sc_ca, **ee_w,
            min_bin=1e-5, max_bin=20.0, num_bins=22, init_embed_size=32,
            proj_w=(wcatT, bcat))
        return fold(rp, z0, proj)

    rows["embed+proj"] = slope_time(lambda rp: (embed_step(rp),), (row_part,))

    # ---- EdgeTransition kernel (+ proj) --------------------------------
    from str2str_tpu.ops import edge_mlp as EM
    hidden = c_z + c_s  # 128 + 2*(256//2)
    z = rnd(B, L, L, c_z)
    ni1, nj1 = rnd(B, L, hidden), rnd(B, L, hidden)
    nfi, nfj = rnd(B, L, c_z), rnd(B, L, c_z)
    em_w = dict(k1z=rnd(c_z, hidden), k2=rnd(hidden, hidden),
                kfh=rnd(hidden, c_z), kfz=rnd(c_z, c_z),
                b1=rnd(hidden), b2=rnd(hidden), bf=rnd(c_z),
                ln_scale=rnd(c_z), ln_bias=rnd(c_z))

    def em_step(zc):
        z2, proj = EM.edge_mlp_pallas(zc, ni1, nj1, nfi, nfj, **em_w,
                                      proj_w=(wcatT.astype(jnp.float32), bcat),
                                      int8_dots=ns.int8)
        return fold(zc, z2, proj)

    rows["edgemlp+proj"] = slope_time(lambda zc: (em_step(zc),), (z,))

    # ---- IPA attention, mega config ------------------------------------
    from str2str_tpu.ops import ipa_attention as IA
    s_q = rnd(B, L, H * C)
    kv = rnd(B, L, H * C), rnd(B, L, H * C)
    qp, kp, vp = rnd(B, L, H * Pq * 3), rnd(B, L, H * Pq * 3), rnd(B, L, H * Pv * 3)
    proj = rnd(B, L, X, L)
    hw = jnp.abs(rnd(H, d=jnp.float32)) + 0.5
    mask = jnp.ones((B, L), jnp.float32)

    def ipa_step(qc, projc):
        o, opt, opair = IA.ipa_attention_with_proj(
            qc, *kv, qp, kp, vp, projc, hw, mask)
        return fold(qc, o, opt, opair), fold(projc, o)

    rows["ipa core (mega)"] = slope_time(ipa_step, (s_q, proj))

    # ---- whole IPA module (mega) minus core = prep + out ----------------
    from str2str_tpu.model.ipa import InvariantPointAttention, Frames
    ipa_mod = InvariantPointAttention(c_hidden=C, no_heads=H, no_qk_points=Pq,
                                      no_v_points=Pv, c_z=c_z, dtype=dt)
    s_node = rnd(B, L, c_s)
    quat = jnp.tile(jnp.asarray([1.0, 0, 0, 0], jnp.float32), (B, L, 1))
    trans = rnd(B, L, 3, d=jnp.float32)
    frames = Frames(quat, trans)
    zb = rnd(B, L, L, c_z)
    params = ipa_mod.init(next(ks), s_node, zb, frames, mask, proj=proj)

    def ipa_mod_step(sc, projc):
        out = ipa_mod.apply(params, sc, zb, frames, mask, proj=projc)
        return fold(sc, out), fold(projc, out)

    rows["ipa module (mega)"] = slope_time(ipa_mod_step, (s_node, proj))

    # ---- transformer block ----------------------------------------------
    from str2str_tpu.model.layers import TransformerEncoder
    tr = TransformerEncoder(num_layers=2, num_heads=4, dim_feedforward=320,
                            dropout=0.1, dtype=dt)
    cat = rnd(B, L, 320)
    tparams = tr.init(next(ks), cat, padding_mask=1.0 - mask,
                      deterministic=True)

    def tr_step(cc):
        out = tr.apply(tparams, cc, padding_mask=1.0 - mask,
                       deterministic=True)
        return (fold(cc, out),)

    rows["transformer block"] = slope_time(lambda cc: tr_step(cc)[0:1], (cat,))

    # ---- node tail: NodeTransition + BackboneUpdate + quat update -------
    from str2str_tpu.model.layers import BackboneUpdate, NodeTransition
    from str2str_tpu.geometry.rigid import quat_compose_update
    nt = NodeTransition(dtype=dt)
    bu = BackboneUpdate(dtype=dt)
    ntp = nt.init(next(ks), s_node)
    bup = bu.init(next(ks), s_node)

    def tail_step(sc):
        h = nt.apply(ntp, sc)
        upd = bu.apply(bup, h)
        q2, t2 = quat_compose_update(quat, trans, upd.astype(jnp.float32),
                                     update_mask=mask[..., None])
        return (fold(sc, h, q2, t2),)

    rows["node tail"] = slope_time(lambda sc: tail_step(sc)[0:1], (s_node,))

    # ---- backward passes (training path) ---------------------------------
    if ns.bwd:
        em_args = (ni1, nj1, nfi, nfj, em_w["k1z"], em_w["k2"], em_w["kfh"],
                   em_w["kfz"], em_w["b1"], em_w["b2"], em_w["bf"],
                   em_w["ln_scale"], em_w["ln_bias"],
                   wcatT.astype(jnp.float32), bcat)

        def em_loss(zc):
            z2, pj = EM.edge_mlp_proj(zc, *em_args)
            return (jnp.sum(z2.astype(jnp.float32))
                    + jnp.sum(pj.astype(jnp.float32)))

        def em_grad_step(zc):
            g = jax.grad(em_loss)(zc)
            return (fold(zc, g),)

        rows["edgemlp fwd+bwd"] = slope_time(lambda zc: em_grad_step(zc)[0:1],
                                             (z,))

        def ipa_loss(qc, projc):
            o, opt, opair = IA.ipa_attention_with_proj(
                qc, *kv, qp, kp, vp, projc, hw, mask)
            return (jnp.sum(o.astype(jnp.float32))
                    + jnp.sum(opt.astype(jnp.float32))
                    + jnp.sum(opair.astype(jnp.float32)))

        def ipa_grad_step(qc, projc):
            gq, gp = jax.grad(ipa_loss, argnums=(0, 1))(qc, projc)
            return fold(qc, gq), fold(projc, gp)

        rows["ipa fwd+bwd (mega)"] = slope_time(ipa_grad_step, (s_q, proj))

        def ee_loss(rp):
            z0, pj = EE.edge_embed_proj(
                rp, col_part, ridx, sc_ca, ee_w["krel"], ee_w["kd"],
                ee_w["k1"], ee_w["k2"], ee_w["b0"], ee_w["b1"], ee_w["b2"],
                ee_w["ln_scale"], ee_w["ln_bias"], wcatT, bcat,
                1e-5, 20.0, 22, 32, 2056, True)
            return (jnp.sum(z0.astype(jnp.float32))
                    + jnp.sum(pj.astype(jnp.float32)))

        def ee_grad_step(rp):
            g = jax.grad(ee_loss)(rp)
            return (fold(rp, g),)

        rows["embed fwd+bwd"] = slope_time(lambda rp: ee_grad_step(rp)[0:1],
                                           (row_part,))

    # ---- report ----------------------------------------------------------
    n_blocks, n_et = 4, 3
    total = (rows["embed+proj"]
             + n_et * rows["edgemlp+proj"]
             + n_blocks * rows["ipa module (mega)"]
             + n_blocks * rows["transformer block"]
             + n_blocks * rows["node tail"])
    print()
    for k, v in rows.items():
        print(f"  {k:22s} {v:7.3f} ms")
    print(f"  {'ipa prep+out (derived)':22s} "
          f"{rows['ipa module (mega)'] - rows['ipa core (mega)']:7.3f} ms")
    print(f"\n  modeled forward (1x embed + {n_et}x edgemlp + {n_blocks}x "
          f"(ipa module + transformer + node tail)) = {total:7.3f} ms")


if __name__ == "__main__":
    main()
