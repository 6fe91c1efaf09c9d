"""Node/edge embedders for the denoising score network.

Capability parity with the reference EmbeddingModule
(`/root/reference/src/models/net/denoising_ipa.py:13-159`): DDPM sinusoidal
time embedding, sinusoidal positional embedding, relative-offset pair
embedding, fixed-mask flag, and the RFDiffusion-style self-conditioning
C-alpha distogram. The edge features are built directly at [B, L, L, .]
(the reference reshapes through [B, L^2, .], which is layout-equivalent).
"""
from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp

from .layers import MLP, linear


def timestep_embedding(t: jnp.ndarray, dim: int, max_positions: int = 10000) -> jnp.ndarray:
    """DDPM sinusoidal embedding of diffusion time t in [0, 1]; (B,) -> (B, dim)."""
    timesteps = t * max_positions
    half = dim // 2
    freqs = jnp.exp(-math.log(max_positions) / (half - 1)
                    * jnp.arange(half, dtype=jnp.float32))
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, [(0, 0), (0, 1)])
    return emb


def positional_embedding(indices: jnp.ndarray, dim: int, max_len: int = 2056) -> jnp.ndarray:
    """Sinusoidal embedding of (possibly relative) integer sequence indices."""
    k = jnp.arange(dim // 2, dtype=jnp.float32)
    scale = math.pi / max_len ** (2 * k / dim)
    args = indices.astype(jnp.float32)[..., None] * scale
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


def distogram(pos: jnp.ndarray, min_bin: float, max_bin: float, num_bins: int) -> jnp.ndarray:
    """One-hot pairwise-distance bins (reference geo_utils.py:44)."""
    d = jnp.linalg.norm(pos[..., :, None, :] - pos[..., None, :, :], axis=-1)
    lower = jnp.linspace(min_bin, max_bin, num_bins)
    upper = jnp.concatenate([lower[1:], jnp.asarray([1e8])])
    return ((d[..., None] > lower) & (d[..., None] < upper)).astype(pos.dtype)


class EdgeEmbedder(nn.Module):
    """Edge-feature MLP with a decomposed first layer.

    The reference concatenates [t_row, t_col, relpos, sc-distogram] into a
    [B, L, L, ~120] tensor before a 3-layer MLP. Mathematically the first
    linear splits per input block: the two time-feature blocks are rank-L
    (computed at [B, L, .] and broadcast-added) and only the relative-
    position / distogram blocks are genuinely pairwise — and those are
    rebuilt from node-sized inputs INSIDE the fused Pallas kernel
    (ops/edge_embed.py), which runs the whole trunk in VMEM and writes the
    [B, L, L, D] result once. Kernel layout matches the reference's packed
    first layer, so torch checkpoints convert by simple transpose."""
    edge_embed_size: int
    t_feat_dim: int      # per-node time-feature width (t embed + fixed flag)
    pos_embed_size: int
    num_bins: int
    min_bin: float
    max_bin: float
    self_conditioning: bool
    max_len: int = 2056
    dtype: jnp.dtype = jnp.float32
    use_pallas: str = "auto"
    # Sequence-sharded long-context mode: when set, this module is running
    # INSIDE shard_map over this mesh axis with replicated inputs, and each
    # device builds only ITS column shard of the edge embedding
    # (B, L, L/n_shards, D). See parallel/seq_shard.py.
    seq_axis: str = ""

    @nn.compact
    def __call__(self, t_feats, residue_idx, sc_ca, proj_w=None):
        """t_feats: (B, L, t_feat_dim); residue_idx: (B, L) int;
        sc_ca: (B, L, 3). Returns (B, L, L, edge_embed_size); with proj_w
        (IPA block 0's fused z-projection weights) given, returns
        (z0, proj0) with proj0 emitted inside the kernel (mega-fusion)."""
        d = self.edge_embed_size
        tf, pe, nb = self.t_feat_dim, self.pos_embed_size, self.num_bins
        self_cond = self.self_conditioning
        in_dim = 2 * tf + pe + (nb if self_cond else 0)

        k0 = self.param("linear_0_kernel",
                        nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
                        (in_dim, d))
        b0 = self.param("linear_0_bias", nn.initializers.zeros, (d,))
        from .layers import INITS, _DenseParams, _LNParams
        k1, b1 = _DenseParams(d, d, kernel_init=INITS["relu"], name="linear_1")()
        k2, b2 = _DenseParams(d, d, kernel_init=INITS["default"], name="linear_2")()
        ln_scale, ln_bias = _LNParams(d, name="norm")()
        dt = self.dtype

        tfc = t_feats.astype(dt)
        row = jnp.einsum("...ic,cd->...id", tfc, k0[:tf].astype(dt))
        col = jnp.einsum("...ic,cd->...id", tfc, k0[tf:2 * tf].astype(dt))
        krel = k0[2 * tf:2 * tf + pe]
        kd = (k0[2 * tf + pe:] if self_cond
              else jnp.zeros((max(nb, 1), d), k0.dtype))

        from ..ops import edge_embed as _ee

        if self.seq_axis:
            # Column-sharded edge embedding: slice this device's key shard
            # of every column-side input and build the rectangular block.
            from ..parallel.seq_shard import local_cols
            sc32 = sc_ca.astype(jnp.float32)
            col_l, idx_l, sc_l = local_cols(
                self.seq_axis, col, residue_idx, sc32)
            use_pallas = (self.use_pallas == "on"
                          or (self.use_pallas == "auto"
                              and _ee.is_supported()))
            if use_pallas:
                # Rectangular fused kernel per shard (custom_vjp; backward
                # differentiates the XLA reference — inference-first).
                if proj_w is not None:
                    return _ee.edge_embed_cols_proj(
                        row, col_l, residue_idx, sc32, idx_l, sc_l,
                        krel, kd, k1, k2, b0, b1, b2, ln_scale, ln_bias,
                        proj_w[0], proj_w[1],
                        self.min_bin, self.max_bin, nb, pe, self.max_len,
                        self_cond)
                return _ee.edge_embed_cols(
                    row, col_l, residue_idx, sc32, idx_l, sc_l,
                    krel, kd, k1, k2, b0, b1, b2, ln_scale, ln_bias,
                    self.min_bin, self.max_bin, nb, pe, self.max_len,
                    self_cond)
            out = _ee.edge_embed_reference(
                row, col_l, residue_idx, sc32,
                krel, kd, k1, k2, b0, b1, b2, ln_scale, ln_bias,
                min_bin=self.min_bin, max_bin=self.max_bin, num_bins=nb,
                init_embed_size=pe, max_len=self.max_len,
                self_conditioning=self_cond,
                residue_idx_col=idx_l, sc_ca_col=sc_l)
            if proj_w is not None:
                return out, _ee._proj_reference(out, *proj_w)
            return out

        use_pallas = (self.use_pallas == "on"
                      or (self.use_pallas == "auto" and _ee.is_supported()))
        if use_pallas:
            # custom_vjp: fused Pallas forward, hand-written Pallas backward.
            if proj_w is not None:
                return _ee.edge_embed_proj(
                    row, col, residue_idx, sc_ca.astype(jnp.float32),
                    krel, kd, k1, k2, b0, b1, b2, ln_scale, ln_bias,
                    proj_w[0], proj_w[1],
                    self.min_bin, self.max_bin, nb, pe, self.max_len,
                    self_cond)
            return _ee.edge_embed(
                row, col, residue_idx, sc_ca.astype(jnp.float32),
                krel, kd, k1, k2, b0, b1, b2, ln_scale, ln_bias,
                self.min_bin, self.max_bin, nb, pe, self.max_len, self_cond)
        if proj_w is not None:
            return _ee.edge_embed_proj_reference(
                row, col, residue_idx, sc_ca.astype(jnp.float32),
                krel, kd, k1, k2, b0, b1, b2, ln_scale, ln_bias,
                proj_w[0], proj_w[1],
                min_bin=self.min_bin, max_bin=self.max_bin, num_bins=nb,
                init_embed_size=pe, max_len=self.max_len,
                self_conditioning=self_cond)
        return _ee.edge_embed_reference(
            row, col, residue_idx, sc_ca.astype(jnp.float32),
            krel, kd, k1, k2, b0, b1, b2, ln_scale, ln_bias,
            min_bin=self.min_bin, max_bin=self.max_bin, num_bins=nb,
            init_embed_size=pe, max_len=self.max_len,
            self_conditioning=self_cond)


class EmbeddingModule(nn.Module):
    init_embed_size: int = 32
    node_embed_size: int = 256
    edge_embed_size: int = 128
    num_bins: int = 22
    min_bin: float = 1e-5
    max_bin: float = 20.0
    self_conditioning: bool = True
    dtype: jnp.dtype = jnp.float32
    use_pallas: str = "auto"
    seq_axis: str = ""

    @nn.compact
    def __call__(self, residue_idx, t, fixed_mask, sc_ca_t, proj_w=None):
        """
        residue_idx: (B, L) int; t: (B,); fixed_mask: (B, L);
        sc_ca_t: (B, L, 3) self-conditioning CA coordinates.
        Returns node (B, L, D_s) and edge (B, L, L, D_z) embeddings —
        plus IPA block 0's fused z projection when proj_w is given.
        """
        B, L = residue_idx.shape
        fixed = fixed_mask.astype(jnp.float32)[..., None]

        t_embed = jnp.tile(timestep_embedding(t, self.init_embed_size)[:, None, :],
                           (1, L, 1))
        t_embed = jnp.concatenate([t_embed, fixed], axis=-1)  # (B, L, D+1)

        node_in = jnp.concatenate(
            [t_embed, positional_embedding(residue_idx, self.init_embed_size)],
            axis=-1).astype(self.dtype)
        node_embed = MLP((self.node_embed_size,) * 3, dtype=self.dtype,
                         name="node_embed")(node_in)

        edge_out = EdgeEmbedder(
            edge_embed_size=self.edge_embed_size,
            t_feat_dim=t_embed.shape[-1],
            pos_embed_size=self.init_embed_size,
            num_bins=self.num_bins, min_bin=self.min_bin, max_bin=self.max_bin,
            self_conditioning=self.self_conditioning, dtype=self.dtype,
            use_pallas=self.use_pallas, seq_axis=self.seq_axis,
            name="edge_embed")(t_embed, residue_idx,
                               sc_ca_t.astype(jnp.float32), proj_w=proj_w)
        if proj_w is not None:
            edge_embed, proj0 = edge_out
            return node_embed, edge_embed, proj0
        return node_embed, edge_out
