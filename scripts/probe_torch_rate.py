#!/usr/bin/env python
"""Probe: reference torch net forward wall time at each crossparity target
length (B=replica_per_batch), to budget the background torch phases."""
from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np
import torch

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from scripts.crossparity import featurize_target, load_reference_module  # noqa: E402


def main():
    den_mod = load_reference_module("src/models/net/denoising_ipa.py", "pr_den")
    ipa_mod = load_reference_module("src/models/net/ipa.py", "pr_ipa")
    torch.manual_seed(0)
    net = den_mod.DenoisingNet(
        den_mod.EmbeddingModule(
            init_embed_size=32, node_embed_size=256, edge_embed_size=128,
            num_bins=22, min_bin=1e-5, max_bin=20.0, self_conditioning=True),
        ipa_mod.TranslationIPA(
            c_s=256, c_z=128, coordinate_scaling=0.1, no_ipa_blocks=4,
            skip_embed_size=64, transformer_num_heads=4,
            transformer_num_layers=2, c_hidden=256, no_heads=8,
            no_qk_points=8, no_v_points=12)).eval()

    B = 50
    for target in sys.argv[1:]:
        feats = featurize_target(target)
        L = feats["aatype"].shape[0]
        batch = {
            "aatype": torch.tensor(feats["aatype"].astype(np.int64))[None].repeat(B, 1),
            "residue_idx": torch.tensor(feats["residue_idx"].astype(np.int64))[None].repeat(B, 1),
            "residue_mask": torch.tensor(feats["residue_mask"].astype(np.float32))[None].repeat(B, 1),
            "fixed_mask": torch.tensor(feats["fixed_mask"].astype(np.float32))[None].repeat(B, 1),
            "torsion_angles_sin_cos": torch.tensor(
                feats["torsion_angles_sin_cos"].astype(np.float32))[None].repeat(B, 1, 1, 1),
            "sc_ca_t": torch.zeros(B, L, 3),
            "t": 0.5 * torch.ones(B),
            "rigids_t": torch.cat([
                torch.tensor([1.0, 0, 0, 0]).expand(B, L, 4),
                torch.randn(1, L, 3).expand(B, L, 3)], dim=-1),
        }
        with torch.no_grad():
            net(batch)  # warmup
            n = 3
            t0 = time.perf_counter()
            for _ in range(n):
                net(batch)
            dt = (time.perf_counter() - t0) / n
        # full-protocol torch phase cost: ~4770 B=50 forwards for 500 confs
        print(f"{Path(target).stem:10s} L={L:3d}  {dt:.3f} s/fwd(B=50)  "
              f"-> est. torch phase (500 conf, T=1000 protocol): {dt*4790/60:.0f} min",
              flush=True)


if __name__ == "__main__":
    main()
