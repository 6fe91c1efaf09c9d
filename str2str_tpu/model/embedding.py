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

from .layers import MLP


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


class EmbeddingModule(nn.Module):
    init_embed_size: int = 32
    node_embed_size: int = 256
    edge_embed_size: int = 128
    num_bins: int = 22
    min_bin: float = 1e-5
    max_bin: float = 20.0
    self_conditioning: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, residue_idx, t, fixed_mask, sc_ca_t):
        """
        residue_idx: (B, L) int; t: (B,); fixed_mask: (B, L);
        sc_ca_t: (B, L, 3) self-conditioning CA coordinates.
        Returns node (B, L, D_s) and edge (B, L, L, D_z) embeddings.
        """
        B, L = residue_idx.shape
        fixed = fixed_mask.astype(jnp.float32)[..., None]

        t_embed = jnp.tile(timestep_embedding(t, self.init_embed_size)[:, None, :],
                           (1, L, 1))
        t_embed = jnp.concatenate([t_embed, fixed], axis=-1)  # (B, L, D+1)

        node_feats = [t_embed, positional_embedding(residue_idx, self.init_embed_size)]

        pair_feats = [jnp.concatenate([
            jnp.broadcast_to(t_embed[:, :, None, :], (B, L, L, t_embed.shape[-1])),
            jnp.broadcast_to(t_embed[:, None, :, :], (B, L, L, t_embed.shape[-1])),
        ], axis=-1)]

        rel_offset = residue_idx[:, :, None] - residue_idx[:, None, :]
        pair_feats.append(positional_embedding(rel_offset, self.init_embed_size))

        if self.self_conditioning:
            pair_feats.append(distogram(
                sc_ca_t.astype(jnp.float32), self.min_bin, self.max_bin,
                self.num_bins))

        node_in = jnp.concatenate(node_feats, axis=-1).astype(self.dtype)
        edge_in = jnp.concatenate(pair_feats, axis=-1).astype(self.dtype)

        node_embed = MLP((self.node_embed_size,) * 3, dtype=self.dtype,
                         name="node_embed")(node_in)
        edge_embed = MLP((self.edge_embed_size,) * 3, dtype=self.dtype,
                         name="edge_embed")(edge_in)
        return node_embed, edge_embed
