"""The denoising score network: embedder + IPA trunk + backbone rebuild.

Capability parity with the reference DenoisingNet
(`/root/reference/src/models/net/denoising_ipa.py:162-211`): takes the
featurized batch at diffusion time t, returns predicted clean frames, the psi
torsion, and the rebuilt backbone atom positions. All geometry stays on
device (`compute_backbone` is pure jnp).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from ..geometry.frames import compute_backbone
from ..geometry.rigid import Rigid
from .embedding import EmbeddingModule
from .ipa import TranslationIPA


@dataclass(frozen=True)
class NetworkConfig:
    # embedder
    init_embed_size: int = 32
    node_embed_size: int = 256
    edge_embed_size: int = 128
    num_bins: int = 22
    min_bin: float = 1e-5
    max_bin: float = 20.0
    self_conditioning: bool = True
    # trunk
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
    # compute dtype for the big matmuls ("float32" or "bfloat16")
    dtype: str = "float32"
    # fused Pallas edge kernels (embedder, edge-MLP): "auto" (on TPU),
    # "on", "off"; custom_vjp forwards, so training uses them too
    use_pallas: str = "auto"
    # fused IPA attention kernel: "auto" (on TPU), "on", "off".
    # 1.7x the XLA attention path at bf16 L=256 (fused single-read z
    # projection + head-major VMEM-resident softmax/aggregation)
    use_pallas_ipa: str = "auto"
    # Sequence-sharded long-context mode: name of the mesh axis the network
    # runs under (inside shard_map) with the edge tensors column-sharded —
    # the L >> 512 path the reference lacks (SURVEY §5.7). Empty = off.
    seq_axis: str = ""
    # INFERENCE-ONLY: run the EdgeTransition trunk matmuls (61% of the
    # forward's cost at the bf16 MXU wall) on the int8 MXU at 2x the bf16
    # rate. No VJP — training must keep this off. Validated
    # distributionally (JS at the 1000-conf seed floor, BASELINE.md).
    edge_dots_int8: bool = False


class ScoreNetwork(nn.Module):
    cfg: NetworkConfig = NetworkConfig()

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray],
                 deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        """
        batch keys (all padded to a static length L):
          rigids_t (B, L, 7), t (B,), residue_idx (B, L) int,
          residue_mask (B, L), fixed_mask (B, L), sc_ca_t (B, L, 3),
          torsion_angles_sin_cos (B, L, 7, 2) [psi GT for fixed residues],
          aatype (B, L) int.
        Returns: quat (B,L,4), trans (B,L,3), rigids tensor_7, psi (B,L,2),
          atom37 (B,L,37,3), atom14 (B,L,14,3).
        """
        cfg = self.cfg
        dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32

        node_mask = batch["residue_mask"].astype(jnp.float32)
        fixed_mask = batch["fixed_mask"].astype(jnp.float32)

        translator = TranslationIPA(
            c_s=cfg.node_embed_size, c_z=cfg.edge_embed_size,
            coordinate_scaling=cfg.coordinate_scaling,
            no_ipa_blocks=cfg.no_ipa_blocks,
            skip_embed_size=cfg.skip_embed_size,
            transformer_num_heads=cfg.transformer_num_heads,
            transformer_num_layers=cfg.transformer_num_layers,
            c_hidden=cfg.c_hidden, no_heads=cfg.no_heads,
            no_qk_points=cfg.no_qk_points, no_v_points=cfg.no_v_points,
            dropout=cfg.dropout, dtype=dtype, use_pallas=cfg.use_pallas,
            use_pallas_ipa=cfg.use_pallas_ipa, seq_axis=cfg.seq_axis,
            edge_dots_int8=cfg.edge_dots_int8,
            name="translator")

        # Block-0 mega-fusion: when both Pallas paths are active, the edge
        # embedder kernel also emits ipa_0's fused z projection while the
        # fresh z0 tile is in VMEM — the attention never reads z0 from HBM.
        from ..ops import edge_mlp as _em_ops
        from ..ops import ipa_attention as _ia_ops
        ipa_on = (cfg.use_pallas_ipa == "on"
                  or (cfg.use_pallas_ipa == "auto" and _ia_ops.is_supported()))
        edge_on = (cfg.use_pallas == "on"
                   or (cfg.use_pallas == "auto" and _em_ops.is_supported()))
        # Also active under the sequence-sharded trunk: the rectangular
        # embedder kernel emits block 0's LOCAL projection per shard.
        use_mega = ipa_on and edge_on
        proj0_w = translator.ipas[0].proj_weights() if use_mega else None

        emb_out = EmbeddingModule(
            init_embed_size=cfg.init_embed_size,
            node_embed_size=cfg.node_embed_size,
            edge_embed_size=cfg.edge_embed_size,
            num_bins=cfg.num_bins, min_bin=cfg.min_bin, max_bin=cfg.max_bin,
            self_conditioning=cfg.self_conditioning, dtype=dtype,
            use_pallas=cfg.use_pallas, seq_axis=cfg.seq_axis,
            name="embedder")(
            batch["residue_idx"], batch["t"], fixed_mask, batch["sc_ca_t"],
            proj_w=proj0_w)
        proj0 = None
        if proj0_w is not None:
            node_embed, edge_embed, proj0 = emb_out
        else:
            node_embed, edge_embed = emb_out
        node_embed = node_embed * node_mask[..., None]
        if not use_mega:
            # Reference masks the edge embedding once after the embedder
            # (denoising_ipa.py:186). Under mega-fusion the multiply is
            # dropped: the edge stack is pointwise per edge (masked-edge
            # values never mix into valid edges), attention kills masked
            # keys with the -1e5 mask bias, and masked edges receive zero
            # cotangents — while the standalone [B, L, L, c_z] multiply
            # costs a full z0 HBM round trip that XLA cannot fuse into
            # either adjacent Pallas call.
            if cfg.seq_axis:
                from ..parallel.seq_shard import local_cols
                edge_mask = node_mask[..., None] * local_cols(
                    cfg.seq_axis, node_mask)[..., None, :]
            else:
                edge_mask = node_mask[..., None] * node_mask[..., None, :]
            edge_embed = edge_embed * edge_mask[..., None]

        trunk_out = translator(
            node_embed, edge_embed, batch["rigids_t"].astype(jnp.float32),
            node_mask, fixed_mask, deterministic=deterministic, proj0=proj0)

        # psi: ground truth for fixed residues, prediction elsewhere.
        gt_psi = batch["torsion_angles_sin_cos"][..., 2, :].astype(jnp.float32)
        psi = (gt_psi * fixed_mask[..., None]
               + trunk_out["psi"].astype(jnp.float32) * (1.0 - fixed_mask[..., None]))

        quat, trans = trunk_out["quat"], trunk_out["trans"]
        rigids = Rigid.from_quat_trans(quat, trans)
        atom37, atom37_mask, atom14 = compute_backbone(
            rigids, psi, batch.get("aatype"))

        return {
            "quat": quat,
            "trans": trans,
            "rigids": jnp.concatenate([quat, trans], axis=-1),
            "psi": psi,
            "atom37": atom37,
            "atom14": atom14,
        }
