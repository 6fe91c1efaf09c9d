"""Invariant Point Attention and the frame-update trunk, TPU-first.

Functional parity with the reference IPA (AF2 Algorithm 22;
`/root/reference/src/models/net/ipa.py:31-268`) with a different compute
layout designed for the MXU:

  * The squared point-distance attention never materializes the
    [B, L, L, H, P, 3] displacement tensor. Using
    sum_p |q_ip - k_jp|^2 = |q_i|^2 + |k_j|^2 - 2 <q_i, k_j>,
    the cross term is one [B, H, L, 3P] x [B, H, 3P, L] matmul — the whole
    point attention becomes MXU work plus rank-1 row/column corrections.
  * Point aggregation (o_pt) is a [B, H, L, L] x [B, H, L, 3P] matmul.
  * Frames are carried as (quat, trans); points are rotated with the
    quaternion form (18 FLOPs/point, fused by XLA) instead of materializing
    per-residue rotation matrices for every q/k/v point set.

The attention weights/softmax run in fp32; inputs may be bf16.
"""
from __future__ import annotations

import math
from typing import NamedTuple, Optional

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

from ..geometry import rotations as rot
from ..geometry.rigid import quat_compose_update
from .layers import (INITS, BackboneUpdate, EdgeTransition, NodeTransition,
                     TorsionAngleHead, TransformerEncoder, linear)

_HP = lax.Precision.HIGHEST


def _mm_prec(net_dtype) -> lax.Precision:
    """Matmul precision for the XLA attention paths, by NETWORK dtype.

    bf16 inference: DEFAULT — one MXU pass with f32 accumulation, the
    TPU-native fast path. HIGHEST on this chip lowers bf16 (and the f32
    upcasts of bf16 values) to a multi-pass algorithm ~3-6x slower for
    precision the bf16 activations do not carry; the XLA attention path
    serves exactly the small-L buckets where the fused kernels gate off,
    so the multi-pass tax lands on the protocol's real (10-80 aa) targets.
    f32 training / float64 golden tests: HIGHEST (bit-comparable numerics
    vs the reference; DEFAULT would degrade genuine f32 operands)."""
    return (lax.Precision.DEFAULT if net_dtype == jnp.bfloat16
            else lax.Precision.HIGHEST)


def _mm_prec_f32(net_dtype) -> lax.Precision:
    """Precision for the f32-operand einsums (point-distance cross term,
    point aggregation): HIGH (3-pass, ~f32 mantissa coverage) in bf16
    inference — DEFAULT would run ONE bf16 pass, whose ~1% relative noise
    is amplified by the |q|^2+|k|^2-2qk cancellation and lands directly on
    output coordinates; their FLOP share is tiny (K = 3P), so the extra
    passes cost nothing. HIGHEST for f32 training / golden parity."""
    return (lax.Precision.HIGH if net_dtype == jnp.bfloat16
            else lax.Precision.HIGHEST)


class Frames(NamedTuple):
    """Per-residue rigid frames carried through the trunk."""
    quat: jnp.ndarray   # (B, L, 4)
    trans: jnp.ndarray  # (B, L, 3)


def _apply_frames(frames: Frames, pts: jnp.ndarray) -> jnp.ndarray:
    """Rotate+translate local points (B, L, n, 3) by per-residue frames."""
    return rot.quat_rotate(frames.quat[..., None, :], pts) + frames.trans[..., None, :]


def _invert_apply_frames(frames: Frames, pts: jnp.ndarray) -> jnp.ndarray:
    q_inv = rot.quat_conjugate(frames.quat)
    return rot.quat_rotate(q_inv[..., None, :], pts - frames.trans[..., None, :])


def _apply_frames_flat(frames: Frames, pts_flat: jnp.ndarray) -> jnp.ndarray:
    """Rotate+translate points held in xyz-BLOCK layout (B, L, 3n):
    columns [x-block | y-block | z-block], any per-block ordering.

    TPU-first form of `_apply_frames`: the interleaved (..., n, 3) layout
    puts the lane axis at width 3 (97% of each VPU op padded away) and
    needs a stack/split relayout on both sides; here the rotation is nine
    full-lane FMAs against broadcast rotation-matrix entries. Exactly the
    same rotation, ~1 ulp dot-order difference vs the quaternion sandwich.
    """
    n = pts_flat.shape[-1] // 3
    x = pts_flat[..., :n]
    y = pts_flat[..., n:2 * n]
    z = pts_flat[..., 2 * n:]
    R = rot.quat_to_matrix(frames.quat)          # (B, L, 3, 3)
    t = frames.trans
    rows = [R[..., i, 0:1] * x + R[..., i, 1:2] * y + R[..., i, 2:3] * z
            + t[..., i:i + 1] for i in range(3)]
    return jnp.concatenate(rows, axis=-1)


def _invert_apply_frames_flat(frames: Frames, pts_flat: jnp.ndarray
                              ) -> jnp.ndarray:
    """Inverse of `_apply_frames_flat` on xyz-block layout: R^T (p - t)."""
    n = pts_flat.shape[-1] // 3
    t = frames.trans
    x = pts_flat[..., :n] - t[..., 0:1]
    y = pts_flat[..., n:2 * n] - t[..., 1:2]
    z = pts_flat[..., 2 * n:] - t[..., 2:3]
    R = rot.quat_to_matrix(frames.quat)
    rows = [R[..., 0, i:i + 1] * x + R[..., 1, i:i + 1] * y
            + R[..., 2, i:i + 1] * z for i in range(3)]
    return jnp.concatenate(rows, axis=-1)


from .layers import _DenseParams  # noqa: E402  (shared fused-kernel helper)


class InvariantPointAttention(nn.Module):
    c_hidden: int = 256
    no_heads: int = 8
    no_qk_points: int = 8
    no_v_points: int = 12
    inf: float = 1e5
    eps: float = 1e-8
    c_z: int = 128
    dtype: jnp.dtype = jnp.float32
    use_pallas: str = "auto"
    # Sequence-sharded long-context mode (inside shard_map): keys/values/z
    # hold only the local column shard; softmax is made exact with
    # pmax/psum and outputs combine with one psum each (parallel/seq_shard).
    seq_axis: str = ""

    def setup(self):
        # Declared in setup (not compact) so the trunk can fold these into
        # the PREVIOUS block's EdgeTransition kernel (edge-stack mega-fusion)
        # before this block's __call__ runs. Param paths are unchanged
        # (ipa_{b}/linear_b, ipa_{b}/down_z).
        self._linear_b = _DenseParams(self.c_z, self.no_heads, name="linear_b")
        self._down_z = _DenseParams(self.c_z, self.c_z // 4, name="down_z")

    def proj_weights(self):
        """Fused [down_z | sqrt(1/3)*linear_b] z-projection weights in the
        layout the EdgeTransition kernel emits proj with:
        wcatT (Cdz+H, c_z) and bcat (Cdz+H,) fp32."""
        from ..ops import ipa_attention as _ia
        kb, bb = self._linear_b()
        kdz, bdz = self._down_z()
        wcat, bcat = _ia.fold_proj_weights(kb, bb, kdz, bdz)
        return wcat.T, bcat

    @nn.compact
    def __call__(self, s: jnp.ndarray, z: jnp.ndarray, frames: Frames,
                 mask: jnp.ndarray, proj: Optional[jnp.ndarray] = None
                 ) -> jnp.ndarray:
        """
        s: (B, L, c_s) node embedding; z: (B, L, L, c_z) edge embedding;
        frames: per-residue rigid frames; mask: (B, L).
        proj: optional precomputed fused z projection (B, L, Cdz+H, L)
        emitted by the previous block's EdgeTransition kernel — when given
        (and the Pallas path is active), z is never read here.
        Returns the (B, L, c_s) node update.
        """
        B, L, _ = s.shape
        H, C = self.no_heads, self.c_hidden
        Pq, Pv = self.no_qk_points, self.no_v_points
        prec = _mm_prec(self.dtype)
        # z is None for the LAST block under mega-fusion (the previous
        # EdgeTransition emitted only proj; its z' was never written).
        c_z = self.c_z if z is None else z.shape[-1]

        # --- packed q/k/v + point projections --------------------------------
        # One (c_s, 3HC + 3H(2Pq+Pv)) matmul instead of four separate Dense
        # calls: one read of s, one MXU dispatch (the four node-sized dots
        # plus their relayouts were ~0.3 ms/block of XLA prep at the
        # B=50/L=128 protocol shape). Param scopes/paths are unchanged
        # (linear_q, linear_kv, linear_q_points, linear_kv_points), so torch
        # checkpoints convert 1:1.
        dt = self.dtype
        wq_, bq_ = _DenseParams(s.shape[-1], H * C,
                                kernel_init=INITS["default"],
                                name="linear_q")()
        wkv_, bkv_ = _DenseParams(s.shape[-1], 2 * H * C,
                                  kernel_init=INITS["default"],
                                  name="linear_kv")()
        wqp_, bqp_ = _DenseParams(s.shape[-1], H * Pq * 3,
                                  kernel_init=INITS["default"],
                                  name="linear_q_points")()
        wkvp_, bkvp_ = _DenseParams(s.shape[-1], H * (Pq + Pv) * 3,
                                    kernel_init=INITS["default"],
                                    name="linear_kv_points")()
        n_q, n_kv = H * C, 2 * H * C
        n_qp = H * Pq * 3

        from ..ops import ipa_attention as _ia
        use_pallas = (not self.seq_axis
                      and (self.use_pallas == "on"
                           or (self.use_pallas == "auto"
                               and _ia.is_supported())))
        if use_pallas:
            # Packed-natural kernel layout (ops/ipa_attention.py
            # ::_fwd_kernel_nat): fold the sqrt(1/(3C)) logit scale into the
            # q columns and reorder the torch-layout kv columns
            # head-contiguous ([k all heads | v all heads]) — weight-sized
            # ops on loop invariants, hoisted out of the anneal scan. The
            # attention kernel then DMAs q/k/v straight from `packed`; no
            # slice/split/relayout of the projection output exists at all.
            perm = (jnp.arange(H)[:, None] * 2 * C
                    + jnp.arange(C)[None, :]).reshape(-1)
            kvperm = jnp.concatenate([perm, perm + C])
            scale_qk = math.sqrt(1.0 / (3 * C))
            W = jnp.concatenate(
                [wq_ * scale_qk, wkv_[:, kvperm], wqp_, wkvp_],
                axis=1).astype(dt)
            bvec = jnp.concatenate(
                [bq_ * scale_qk, bkv_[kvperm], bqp_, bkvp_]).astype(dt)
        else:
            W = jnp.concatenate([wq_, wkv_, wqp_, wkvp_], axis=1).astype(dt)
            bvec = jnp.concatenate([bq_, bkv_, bqp_, bkvp_]).astype(dt)
        packed = jnp.dot(s.astype(dt), W) + bvec
        if not use_pallas:
            q = packed[..., :n_q].reshape(B, L, H, C)
            k, v = jnp.split(
                packed[..., n_q:n_q + n_kv].reshape(B, L, H, 2 * C), 2,
                axis=-1)

        # Point q/k/v in global coordinates. The torch layout packs points as
        # (x..x y..y z..z) — already the xyz-block layout the flat frame
        # application wants, so both point sets rotate through nine
        # full-lane FMAs with NO stack/split relayout; one minor-axis
        # transpose afterwards produces the (..., P, 3) kernel layout.
        q_pts = _apply_frames_flat(
            frames, packed[..., n_q + n_kv:n_q + n_kv + n_qp]
        ).reshape(B, L, 3, H, Pq).transpose(0, 1, 3, 4, 2)
        kv_pts = _apply_frames_flat(
            frames, packed[..., n_q + n_kv + n_qp:]
        ).reshape(B, L, 3, H, Pq + Pv).transpose(0, 1, 3, 4, 2)
        k_pts, v_pts = kv_pts[..., :Pq, :], kv_pts[..., Pq:, :]

        head_weights = nn.softplus(self.param(
            "head_weights", nn.initializers.constant(0.541324854612918), (H,)))

        kb, bb = self._linear_b()
        kdz, bdz = self._down_z()

        if use_pallas:
            # custom_vjp wrappers: fused Pallas forward AND hand-written
            # Pallas backward, so this path is live for training too. The
            # scalar q/k/v never leave `packed` (see the weight fold above).
            flatp = (q_pts.reshape(B, L, H * Pq * 3),
                     k_pts.reshape(B, L, H * Pq * 3),
                     v_pts.reshape(B, L, H * Pv * 3))
            if proj is not None:
                # Mega-fusion: proj was emitted by the previous block's
                # EdgeTransition kernel; z is not read at all.
                o, opt_flat, o_pair = _ia.ipa_attention_packed_with_proj(
                    packed, *flatp, proj, head_weights, mask, c_hidden=C)
            else:
                o, opt_flat, o_pair = _ia.ipa_attention_packed(
                    packed, *flatp, z, kb, bb, kdz, bdz, head_weights, mask,
                    c_hidden=C)
            o_pt = opt_flat.reshape(B, L, H * Pv, 3)
        else:
            # XLA attention path. In sequence-sharded mode the key-side
            # tensors are sliced to this device's column shard and the
            # softmax / output reductions become exact cross-shard
            # collectives (z already arrives as the local shard).
            kl, vl, k_pts_l = k, v, k_pts
            v_pts_l, mask_l = v_pts, mask
            if self.seq_axis:
                from ..parallel.seq_shard import local_cols
                kl, vl, k_pts_l, v_pts_l, mask_l = local_cols(
                    self.seq_axis, k, v, k_pts, v_pts, mask)

            use_seq_kernel = bool(self.seq_axis) and (
                self.use_pallas == "on"
                or (self.use_pallas == "auto" and _ia.is_supported()))
            if use_seq_kernel:
                # Fused Pallas attention over the LOCAL key shard with
                # flash-style partial softmax; the exact combine is two
                # pmax/psum rounds over the sequence axis
                # (ops/ipa_attention.py::ipa_attention_partial).
                Lk = kl.shape[1]
                flat = (q.reshape(B, L, H * C),
                        kl.reshape(B, Lk, H * C), vl.reshape(B, Lk, H * C),
                        q_pts.reshape(B, L, H * Pq * 3),
                        k_pts_l.reshape(B, Lk, H * Pq * 3),
                        v_pts_l.reshape(B, Lk, H * Pv * 3))
                if proj is not None:
                    # Sharded mega-fusion: the previous block's rectangular
                    # EdgeTransition kernel emitted this shard's projection.
                    ou, optu, opairu, mloc, sloc = \
                        _ia.ipa_attention_partial_with_proj(
                            *flat, proj, head_weights, mask_l)
                else:
                    ou, optu, opairu, mloc, sloc = _ia.ipa_attention_partial(
                        *flat, z, kb, bb, kdz, bdz, head_weights, mask_l)
                # The softmax is shift-invariant in the max, so its gradient
                # contribution is exactly zero — stop_gradient makes that
                # explicit for AD. It must sit INSIDE the pmax: pmax has no
                # differentiation rule, and linearization reaches it before
                # an outer stop_gradient could discard the tangent.
                m_g = lax.pmax(lax.stop_gradient(mloc), self.seq_axis)
                w = jnp.exp(mloc - m_g)                        # (B,H,L,1)
                denom = lax.psum(sloc * w, self.seq_axis)
                o4 = lax.psum(ou * w, self.seq_axis) / denom
                opt4 = lax.psum(optu * w, self.seq_axis) / denom
                wq = w.transpose(0, 2, 1, 3)                   # (B,L,H,1)
                opair4 = (lax.psum(opairu * wq, self.seq_axis)
                          / denom.transpose(0, 2, 1, 3))
                dt_o = q.dtype
                o = _ia._unheads(o4.astype(dt_o))              # (B,L,H*C)
                opt_flat = _ia._unheads(opt4.astype(dt_o))
                o_pt = opt_flat.reshape(B, L, H * Pv, 3)
                o_pair = opair4.reshape(B, L, H * (c_z // 4)).astype(dt_o)
            else:
                a = jnp.einsum("blhc,bmhc->bhlm", q, kl, precision=prec)
                a = a * math.sqrt(1.0 / (3 * C))
                b = jnp.einsum("blmc,ch->blmh", z, kb.astype(z.dtype)) + bb
                a = a + math.sqrt(1.0 / 3) * jnp.transpose(b, (0, 3, 1, 2))

                # Point attention via the distance expansion (MXU form).
                Lk = kl.shape[1]
                pt_scale = head_weights * math.sqrt(1.0 / (3 * (Pq * 9.0 / 2)))
                qf = q_pts.astype(jnp.float32).transpose(0, 2, 1, 3, 4).reshape(B, H, L, Pq * 3)
                kf = k_pts_l.astype(jnp.float32).transpose(0, 2, 1, 3, 4).reshape(B, H, Lk, Pq * 3)
                cross = jnp.einsum("bhlp,bhmp->bhlm", qf, kf,
                                   precision=_mm_prec_f32(self.dtype))
                q_sq = jnp.sum(qf * qf, axis=-1)  # (B, H, L)
                k_sq = jnp.sum(kf * kf, axis=-1)  # (B, H, Lk)
                dist2 = q_sq[..., :, None] + k_sq[..., None, :] - 2.0 * cross
                a = a - 0.5 * pt_scale[None, :, None, None] * dist2

                square_mask = self.inf * (mask[:, None, :, None]
                                          * mask_l[:, None, None, :] - 1.0)
                a = (a + square_mask).astype(jnp.float32)
                if self.seq_axis:
                    # stop_gradient INSIDE the pmax: exact (softmax is
                    # shift-invariant in the max) and required — pmax has no
                    # differentiation rule, and linearization reaches it
                    # before an outer stop_gradient would.
                    amax = lax.pmax(
                        lax.stop_gradient(jnp.max(a, axis=-1, keepdims=True)),
                        self.seq_axis)
                    e = jnp.exp(a - amax)
                    denom = lax.psum(jnp.sum(e, axis=-1, keepdims=True),
                                     self.seq_axis)
                    a = e / denom
                else:
                    a = nn.softmax(a, axis=-1)

                # scalar values
                o = jnp.einsum("bhlm,bmhc->blhc", a.astype(vl.dtype), vl,
                               precision=prec)
                o = o.reshape(B, L, H * C)

                # point values: aggregate in global coords
                vf = v_pts_l.transpose(0, 2, 1, 3, 4).reshape(B, H, Lk, Pv * 3)
                o_pt = jnp.einsum("bhlm,bhmp->bhlp", a.astype(vf.dtype), vf,
                                  precision=_mm_prec_f32(self.dtype))
                o_pt = o_pt.reshape(B, H, L, Pv, 3).transpose(0, 2, 1, 3, 4)
                o_pt = o_pt.reshape(B, L, H * Pv, 3)

                # pair values
                pair_z = (jnp.einsum("blmc,cd->blmd", z, kdz.astype(z.dtype))
                          + bdz).astype(z.dtype)
                o_pair = jnp.einsum("bhlm,blmc->blhc", a.astype(pair_z.dtype),
                                    pair_z, precision=prec).reshape(B, L, H * (c_z // 4))
                o_pair = o_pair.astype(o.dtype)
                if self.seq_axis:
                    # Partial sums over local keys -> exact with one psum each.
                    o = lax.psum(o, self.seq_axis)
                    o_pt = lax.psum(o_pt, self.seq_axis)
                    o_pair = lax.psum(o_pair, self.seq_axis)

        # back to local frames + norms
        # Back to local frames + norms, in xyz-block layout: one minor-axis
        # transpose, then nine full-lane FMAs (see _apply_frames_flat) and a
        # full-lane norm — the interleaved form runs every op at lane
        # width 3. The resulting [x | y | z] block concat is exactly the
        # torch linear_out column layout (reference unbinds o_pt into
        # x/y/z chunks before its concat).
        o_pt_f = _invert_apply_frames_flat(
            frames, o_pt.transpose(0, 1, 3, 2).reshape(B, L, 3 * H * Pv))
        npv = H * Pv
        o_pt_norm = jnp.sqrt(
            o_pt_f[..., :npv].astype(jnp.float32) ** 2
            + o_pt_f[..., npv:2 * npv].astype(jnp.float32) ** 2
            + o_pt_f[..., 2 * npv:].astype(jnp.float32) ** 2
            + self.eps).astype(o.dtype)  # (B, L, H*Pv)

        # Output projection, decomposed over the concat pieces: the reference
        # concatenates [o, o_pt x/y/z, norms, pair] into a (B, L, 2688)
        # tensor for one Dense — materializing a full extra copy of o
        # (2048 of the 2688 lanes) per block. Splitting the matmul at the
        # same row boundaries of the SAME kernel parameter is exact up to
        # dot-order rounding, keeps the torch checkpoint layout, and lets o
        # flow from the attention kernel straight into the MXU.
        wout, bout = _DenseParams(
            o.shape[-1] + 4 * H * Pv + o_pair.shape[-1],
            s.shape[-1], kernel_init=INITS["final"], name="linear_out")()
        dt_out = o.dtype
        n1 = o.shape[-1]
        rest = jnp.concatenate([o_pt_f, o_pt_norm, o_pair], axis=-1)
        w = wout.astype(dt_out)
        return (jnp.dot(o, w[:n1]) + jnp.dot(rest, w[n1:])
                + bout.astype(dt_out))


class TranslationIPA(nn.Module):
    """IPA trunk: per block IPA -> LN residual -> skip-concat transformer ->
    node transition -> rigid update; edge transition between blocks
    (reference ipa.py:271-387)."""
    c_s: int = 256
    c_z: int = 128
    coordinate_scaling: float = 0.1
    no_ipa_blocks: int = 4
    skip_embed_size: int = 64
    transformer_num_heads: int = 4
    transformer_num_layers: int = 2
    c_hidden: int = 256
    no_heads: int = 8
    no_qk_points: int = 8
    no_v_points: int = 12
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    use_pallas: str = "auto"
    use_pallas_ipa: str = "auto"
    seq_axis: str = ""
    edge_dots_int8: bool = False  # inference-only int8 EdgeTransition dots

    def setup(self):
        # Defined in setup so the NETWORK can fold ipa_0's z-projection
        # weights into the edge-embedder kernel (block-0 mega-fusion)
        # before this module's __call__ runs.
        self.ipas = [InvariantPointAttention(
            c_hidden=self.c_hidden, no_heads=self.no_heads,
            no_qk_points=self.no_qk_points, no_v_points=self.no_v_points,
            c_z=self.c_z, dtype=self.dtype, use_pallas=self.use_pallas_ipa,
            seq_axis=self.seq_axis,
            name=f"ipa_{b}") for b in range(self.no_ipa_blocks)]

    @nn.compact
    def __call__(self, node_embed, edge_embed, rigids_t7, residue_mask,
                 fixed_mask, deterministic: bool = True, proj0=None):
        node_mask = residue_mask.astype(node_embed.dtype)
        diffuse_mask = (1.0 - fixed_mask.astype(node_embed.dtype)) * node_mask

        quat = rigids_t7[..., :4]
        quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
        trans = rigids_t7[..., 4:] * self.coordinate_scaling
        frames = Frames(quat, trans)

        from ..ops import edge_mlp as _em_ops
        from ..ops import ipa_attention as _ia_ops

        # Edge-stack mega-fusion: with both edge kernels active, each
        # EdgeTransition kernel also emits the NEXT block's fused z
        # projection while the fresh z tile is in VMEM, so the attention
        # never reads z from HBM (ops/edge_mlp.py `_kernel_proj`).
        ipa_on = (self.use_pallas_ipa == "on"
                  or (self.use_pallas_ipa == "auto" and _ia_ops.is_supported()))
        edge_on = (self.use_pallas == "on"
                   or (self.use_pallas == "auto" and _em_ops.is_supported()))
        # Mega-fusion also runs under the sequence-sharded trunk: the
        # rectangular EdgeTransition kernel emits this shard's projection
        # and the partial-softmax attention consumes it.
        use_mega = ipa_on and edge_on
        ipas = self.ipas

        init_node_embed = node_embed
        proj = proj0  # block 0's projection when the embedder emitted it
        for b in range(self.no_ipa_blocks):
            ipa_out = ipas[b](node_embed, edge_embed, frames, node_mask,
                              proj=proj)
            ipa_out = ipa_out * node_mask[..., None]
            node_embed = nn.LayerNorm(dtype=jnp.float32, name=f"ipa_ln_{b}")(
                node_embed + ipa_out)

            skip = linear(self.skip_embed_size, init="final", dtype=self.dtype,
                          name=f"skip_embed_{b}")(init_node_embed)
            concat = jnp.concatenate([node_embed, skip], axis=-1)
            transformed = TransformerEncoder(
                num_layers=self.transformer_num_layers,
                num_heads=self.transformer_num_heads,
                dim_feedforward=concat.shape[-1],
                dropout=self.dropout, dtype=self.dtype,
                name=f"transformer_{b}")(
                concat, padding_mask=1.0 - node_mask,
                deterministic=deterministic)
            node_embed = node_embed + linear(
                self.c_s, init="final", dtype=self.dtype,
                name=f"linear_{b}")(transformed)

            node_embed = NodeTransition(
                dtype=self.dtype, name=f"node_transition_{b}")(node_embed)
            node_embed = node_embed * node_mask[..., None]

            update = BackboneUpdate(dtype=self.dtype, name=f"bb_update_{b}")(
                node_embed * diffuse_mask[..., None])
            quat, trans = quat_compose_update(
                frames.quat, frames.trans, update.astype(jnp.float32),
                update_mask=diffuse_mask[..., None])
            frames = Frames(quat, trans)

            if b < self.no_ipa_blocks - 1:
                # No inter-block edge mask: the reference masks the edge
                # embedding once after the embedder (denoising_ipa.py:186)
                # and never between blocks — masked-key logits are killed by
                # the attention mask bias regardless, and dropping the
                # multiply saves a full z read+write per block.
                et = EdgeTransition(
                    edge_embed_out=self.c_z, dtype=self.dtype,
                    use_pallas=self.use_pallas,
                    seq_axis=self.seq_axis,
                    dots_int8=self.edge_dots_int8,
                    name=f"edge_transition_{b}")
                if use_mega:
                    # The LAST transition's z' is dead (the final IPA block
                    # consumes proj; nothing reads z' afterwards): skip its
                    # [B, L, L, c_z] HBM write entirely.
                    edge_embed, proj = et(
                        node_embed, edge_embed,
                        proj_w=ipas[b + 1].proj_weights(),
                        need_out=b < self.no_ipa_blocks - 2)
                else:
                    edge_embed = et(node_embed, edge_embed)
                    proj = None

        psi = TorsionAngleHead(n_torsion_angles=1, dtype=self.dtype,
                               name="torsion_pred")(node_embed)  # (B, L, 2)

        out_trans = frames.trans / self.coordinate_scaling
        return {
            "quat": frames.quat,
            "trans": out_trans,
            "psi": psi,
        }
