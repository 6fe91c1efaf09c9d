#!/usr/bin/env python
"""Roofline/MFU analysis of one score-network forward (the NFE unit).

Uses XLA's compiled cost analysis for FLOPs and HBM bytes at the headline
shape (L=256, B=8), combines with the measured NFE rate to report MFU and
HBM-bandwidth utilization against TPU v5e peaks. Writes the numbers used by
BASELINE.md.

Usage: python scripts/roofline.py [measured_nfe_per_sec]
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# v5e peaks (public): 394 TFLOP/s bf16, 197 TFLOP/s fp32 (via bf16x2 passes),
# 819 GB/s HBM.
PEAK_BF16 = 394e12
PEAK_HBM = 819e9

L, B = 256, 8


def main():
    measured_nfe = float(sys.argv[1]) if len(sys.argv) > 1 else None

    import jax
    import jax.numpy as jnp
    from str2str_tpu.model.network import NetworkConfig, ScoreNetwork

    for dtype, pallas_ipa in (("bfloat16", "off"), ("bfloat16", "on")):
        net = ScoreNetwork(NetworkConfig(dtype=dtype,
                                         use_pallas="off",
                                         use_pallas_ipa="off"))
        rng = np.random.RandomState(0)
        q = rng.randn(B, L, 4).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        batch = {
            "rigids_t": jnp.asarray(
                np.concatenate([q, rng.randn(B, L, 3).astype(np.float32)], -1)),
            "t": jnp.full((B,), 0.5),
            "residue_idx": jnp.tile(jnp.arange(L, dtype=jnp.int32), (B, 1)),
            "residue_mask": jnp.ones((B, L)),
            "fixed_mask": jnp.zeros((B, L)),
            "sc_ca_t": jnp.asarray(rng.randn(B, L, 3).astype(np.float32)),
            "torsion_angles_sin_cos": jnp.asarray(
                rng.randn(B, L, 7, 2).astype(np.float32)),
            "aatype": jnp.asarray(rng.randint(0, 20, (B, L)).astype(np.int32)),
        }
        params = net.init(jax.random.PRNGKey(0), batch)
        compiled = jax.jit(lambda p, b: net.apply(p, b)).lower(
            params, batch).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = ca.get("flops", float("nan"))
        bytes_acc = ca.get("bytes accessed", float("nan"))
        print(f"[{dtype}, pallas_ipa={pallas_ipa}] XLA cost analysis, one "
              f"forward (B={B}, L={L}):")
        print(f"  flops          : {flops / 1e9:8.1f} GFLOP "
              f"({flops / B / 1e9:.2f} GFLOP/NFE)")
        print(f"  bytes accessed : {bytes_acc / 1e6:8.1f} MB "
              f"({bytes_acc / B / 1e6:.1f} MB/NFE)")
        if measured_nfe:
            t_batch = B / measured_nfe  # seconds per forward of B replicas
            mfu = flops / t_batch / PEAK_BF16
            hbm = bytes_acc / t_batch / PEAK_HBM
            floor_compute = flops / PEAK_BF16
            floor_hbm = bytes_acc / PEAK_HBM
            print(f"  measured       : {measured_nfe:.0f} NFE/s -> "
                  f"{t_batch * 1e3:.2f} ms per B={B} forward")
            print(f"  MFU            : {mfu * 100:5.1f}% of bf16 peak")
            print(f"  HBM util       : {hbm * 100:5.1f}% of {PEAK_HBM/1e9:.0f} GB/s")
            print(f"  roofline floor : compute {floor_compute*1e3:.2f} ms, "
                  f"HBM {floor_hbm*1e3:.2f} ms per forward")
        break  # cost analysis is for the XLA graph; one pass is enough


if __name__ == "__main__":
    main()
