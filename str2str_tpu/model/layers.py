"""Network building blocks (flax.linen) with the AF2 initializer zoo.

Capability parity with the reference layer library
(`/root/reference/src/models/net/layers.py`): Linear init variants
(lecun/he/glorot/gating/normal/final-zero), NodeTransition, EdgeTransition,
TorsionAngleHead, BackboneUpdate, plus a post-LN transformer encoder matching
torch `nn.TransformerEncoder` semantics (packed-QKV attention, ReLU FF) so
that torch checkpoints convert 1:1.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

# jax's truncated-normal variance scaling already includes the truncation
# stddev correction, matching the scipy-based init in the reference.
INITS = {
    "default": nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
    "relu": nn.initializers.variance_scaling(2.0, "fan_in", "truncated_normal"),
    "glorot": nn.initializers.xavier_uniform(),
    "gating": nn.initializers.zeros,
    "normal": nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
    "final": nn.initializers.zeros,
}


def linear(features: int, init: str = "default", use_bias: bool = True,
           dtype=jnp.float32, name: Optional[str] = None) -> nn.Dense:
    """nn.Dense with an AF2-style `init` string; bias starts at zero
    (or one for "gating")."""
    bias_init = (nn.initializers.ones if init == "gating"
                 else nn.initializers.zeros)
    return nn.Dense(features, use_bias=use_bias, dtype=dtype,
                    kernel_init=INITS[init], bias_init=bias_init, name=name)


class MLP(nn.Module):
    """Stack of Linear+activation used by the embedders."""
    features: tuple
    init_last: str = "default"
    final_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features):
            last = i == len(self.features) - 1
            x = linear(f, init=self.init_last if last else "relu",
                       dtype=self.dtype, name=f"linear_{i}")(x)
            if not last:
                x = nn.relu(x)
        if self.final_norm:
            x = nn.LayerNorm(dtype=jnp.float32, name="norm")(x)
        return x


class NodeTransition(nn.Module):
    """3-layer residual MLP + LayerNorm (reference layers.py:128)."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, s):
        dim = s.shape[-1]
        h = nn.relu(linear(dim, init="relu", dtype=self.dtype, name="linear_1")(s))
        h = nn.relu(linear(dim, init="relu", dtype=self.dtype, name="linear_2")(h))
        h = linear(dim, init="final", dtype=self.dtype, name="linear_3")(h)
        return nn.LayerNorm(dtype=jnp.float32, name="ln")(s + h)


class _LNParams(nn.Module):
    """Bare LayerNorm parameters (scale/bias) under a named scope, applied
    manually inside fused kernels."""
    dim: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return scale, bias


class _DenseParams(nn.Module):
    """Bare Dense parameters (kernel/bias) under a named scope, matching
    nn.Dense's param layout, applied manually inside fused kernels."""
    in_dim: int
    out_dim: int
    kernel_init: object = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", self.kernel_init,
                            (self.in_dim, self.out_dim))
        bias = self.param("bias", nn.initializers.zeros, (self.out_dim,))
        return kernel, bias


class EdgeTransition(nn.Module):
    """Edge update biased by the node embeddings (reference layers.py:148).

    The reference concatenates row/col-tiled node embeddings onto the edge
    tensor before a residual MLP — materializing two extra [B, L, L, C/2]
    tensors plus the [B, L, L, 2C] concat. Here the mathematically identical
    computation is decomposed: every matmul against the concat splits into an
    edge part (L^2 rows) plus two *rank-L* node parts that broadcast into the
    sum, so only genuinely O(L^2) activations ever hit HBM. Parameter layout
    is unchanged (kernels are sliced at apply time), so torch checkpoints
    convert 1:1."""
    edge_embed_out: int
    num_layers: int = 2
    node_dilation: int = 2
    dtype: jnp.dtype = jnp.float32
    use_pallas: str = "auto"  # "auto" | "on" | "off"
    # Sequence-sharded mode: edge_embed holds only this device's column
    # shard; the column-side node contributions are sliced to match
    # (pointwise over (i, j) — no communication).
    seq_axis: str = ""
    # INFERENCE-ONLY: run the four trunk matmuls on the int8 MXU (394 TOPS
    # vs 197 TFLOP/s bf16; per-channel weight + per-row activation scales).
    # No VJP — training paths must keep this off.
    dots_int8: bool = False

    @nn.compact
    def __call__(self, node_embed, edge_embed, proj_w=None,
                 need_out: bool = True):
        """proj_w: optional (wcatT (X, c_out), bcat (X,)) — the next IPA
        block's fused z-projection weights. When given, returns
        (new_edge_embed, proj) with proj emitted inside the fused kernel
        while the output tile is in VMEM (edge-stack mega-fusion). With
        need_out=False (the LAST transition, whose z' is dead under
        mega-fusion) the z' write is skipped and the return is
        (None, proj)."""
        assert self.num_layers == 2, "decomposed trunk is written for 2 layers"
        c_node = node_embed.shape[-1]
        c_edge = edge_embed.shape[-1]
        bias_dim = c_node // self.node_dilation
        hidden = c_edge + 2 * bias_dim

        node_small = linear(bias_dim, init="relu", dtype=self.dtype,
                            name="initial_embed")(node_embed)      # (B, L, c/2)

        k1 = self.param("trunk_0_kernel", INITS["relu"], (hidden, hidden))
        b1 = self.param("trunk_0_bias", nn.initializers.zeros, (hidden,))
        k2 = self.param("trunk_1_kernel", INITS["relu"], (hidden, hidden))
        b2 = self.param("trunk_1_bias", nn.initializers.zeros, (hidden,))
        kf = self.param("final_kernel", nn.initializers.zeros,
                        (hidden, self.edge_embed_out))
        bf = self.param("final_bias", nn.initializers.zeros,
                        (self.edge_embed_out,))
        ln_scale, ln_bias = _LNParams(self.edge_embed_out, name="layer_norm")()

        dt = self.dtype
        z = edge_embed.astype(dt)
        n = node_small.astype(dt)

        from ..ops import edge_mlp as _em

        use_pallas = (self.use_pallas == "on"
                      or (self.use_pallas == "auto" and _em.is_supported()))

        # Rank-L node contributions through the kernel slices.
        def node_parts(kernel):
            ki = kernel[c_edge:c_edge + bias_dim].astype(dt)
            kj = kernel[c_edge + bias_dim:].astype(dt)
            return (jnp.einsum("...ic,cd->...id", n, ki),
                    jnp.einsum("...jc,cd->...jd", n, kj))

        ni1, nj1 = node_parts(k1)
        nfi, nfj = node_parts(kf)
        if self.seq_axis:
            from ..parallel.seq_shard import local_cols
            nj1, nfj = local_cols(self.seq_axis, nj1, nfj)

        # edge_mlp is a custom_vjp with hand-written Pallas forward AND
        # backward kernels, so this path is live for training too.
        base_args = (z, ni1, nj1, nfi, nfj,
                     k1[:c_edge], k2, kf, kf[:c_edge], b1, b2, bf,
                     ln_scale, ln_bias)
        if self.dots_int8:
            if not use_pallas:
                # Never measure the fp path while reporting the int8 config:
                # there is no XLA int8 fallback, so a silent no-op would
                # invalidate any benchmark/eval run with this flag set.
                raise ValueError(
                    "edge_dots_int8=True requires the Pallas TPU path "
                    f"(use_pallas={self.use_pallas!r}, "
                    f"tpu={_em.is_supported()}); unset the flag or run on "
                    "TPU with use_pallas=auto/on")
            out = _em.edge_mlp_pallas(*base_args, proj_w=proj_w,
                                      need_out=need_out, int8_dots=True)
            if proj_w is not None and not need_out:
                return None, out
            return out
        if proj_w is not None:
            if not need_out:
                fn = (_em.edge_mlp_proj_only if use_pallas
                      else _em.edge_mlp_proj_only_reference)
                return None, fn(*base_args, proj_w[0], proj_w[1])
            fn = _em.edge_mlp_proj if use_pallas else _em.edge_mlp_proj_reference
            return fn(*base_args, proj_w[0], proj_w[1])
        fn = _em.edge_mlp if use_pallas else _em.edge_mlp_reference
        return fn(*base_args)


class TorsionAngleHead(nn.Module):
    """Residual MLP -> unit-circle sin/cos per torsion (reference layers.py:188)."""
    n_torsion_angles: int = 1
    eps: float = 1e-8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, s):
        dim = s.shape[-1]
        h = nn.relu(linear(dim, init="relu", dtype=self.dtype, name="linear_1")(s))
        h = linear(dim, init="final", dtype=self.dtype, name="linear_2")(h)
        h = h + s
        raw = linear(self.n_torsion_angles * 2, init="final", dtype=self.dtype, name="linear_final")(h)
        norm = jnp.sqrt(jnp.clip(
            jnp.sum(raw.astype(jnp.float32) ** 2, axis=-1, keepdims=True),
            min=self.eps))
        return raw / norm


class BackboneUpdate(nn.Module):
    """Linear head producing the 6-vector rigid update (AF2 Alg. 23;
    reference layers.py:216). Zero-initialized: identity update at init."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, s):
        return linear(6, init="final", dtype=self.dtype, name="linear")(s)


class SelfAttention(nn.Module):
    """Multi-head self-attention with a packed QKV projection, matching torch
    `nn.MultiheadAttention` parameter layout (in_proj + out_proj)."""
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, padding_mask=None):
        d = x.shape[-1]
        h = self.num_heads
        dh = d // h
        qkv = linear(3 * d, init="glorot", dtype=self.dtype, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        # bf16 inference: one-pass MXU (HIGHEST lowers bf16 operands to a
        # multi-pass algorithm ~3-6x slower; see model/ipa.py::_mm_prec).
        prec = (lax.Precision.DEFAULT if self.dtype == jnp.bfloat16
                else lax.Precision.HIGHEST)

        def heads(t):
            return t.reshape(t.shape[:-1] + (h, dh))

        q, k, v = heads(q), heads(k), heads(v)
        logits = jnp.einsum("...qhd,...khd->...hqk", q, k,
                            precision=prec) / jnp.sqrt(
            jnp.asarray(dh, jnp.float32))
        if padding_mask is not None:
            # padding_mask: 1.0 = masked (torch key_padding_mask convention).
            # Large-finite instead of -inf so fully-padded query rows produce
            # a uniform distribution rather than NaNs.
            bias = jnp.where(padding_mask[..., None, None, :] > 0.5, -1e9, 0.0)
            logits = logits + bias
        a = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
        o = jnp.einsum("...hqk,...khd->...qhd", a, v,
                       precision=prec)
        o = o.reshape(o.shape[:-2] + (d,))
        return linear(d, init="glorot", dtype=self.dtype, name="out_proj")(o)


class TransformerEncoderLayer(nn.Module):
    """Post-LN transformer layer: x = LN(x + MHA(x)); x = LN(x + FF(x)).

    Matches torch `nn.TransformerEncoderLayer` defaults (ReLU, post-norm,
    dropout applied to attention output and FF hidden/output)."""
    num_heads: int
    dim_feedforward: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, padding_mask=None, deterministic: bool = True):
        a = SelfAttention(self.num_heads, dtype=self.dtype, name="self_attn")(
            x, padding_mask)
        a = nn.Dropout(self.dropout, deterministic=deterministic)(a)
        x = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x + a)
        f = linear(self.dim_feedforward, init="glorot", dtype=self.dtype, name="linear1")(x)
        f = nn.Dropout(self.dropout, deterministic=deterministic)(nn.relu(f))
        f = linear(x.shape[-1], init="glorot", dtype=self.dtype, name="linear2")(f)
        f = nn.Dropout(self.dropout, deterministic=deterministic)(f)
        return nn.LayerNorm(dtype=jnp.float32, name="norm2")(x + f)


class TransformerEncoder(nn.Module):
    num_layers: int
    num_heads: int
    dim_feedforward: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, padding_mask=None, deterministic: bool = True):
        for i in range(self.num_layers):
            x = TransformerEncoderLayer(
                self.num_heads, self.dim_feedforward, self.dropout,
                dtype=self.dtype, name=f"layers_{i}")(
                x, padding_mask, deterministic)
        return x
