#!/usr/bin/env python
"""Multi-chip scaling evidence on the 8-device virtual CPU mesh.

Real multi-chip hardware is not available in this environment, so this
bench establishes (a) CORRECTNESS-scaling: the sharded sampler and the
data-parallel train step produce device-count-independent results, and
(b) the per-chip THROUGHPUT MODEL: the sampler is embarrassingly parallel
over replicas (zero cross-chip collectives inside the anneal scan), and the
train step's only collective is the gradient psum, whose ICI cost is
modeled from parameter bytes vs per-step compute.

Prints one JSON line per section. Run:
    python bench_multichip.py
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

# 8 virtual CPU devices (must precede the first jax backend touch).
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def build():
    from str2str_tpu.diffusion.r3 import R3Config, R3Diffusion
    from str2str_tpu.diffusion.se3 import SE3Diffusion
    from str2str_tpu.diffusion.so3 import SO3Config, SO3Diffusion
    from str2str_tpu.model.network import NetworkConfig, ScoreNetwork

    net = ScoreNetwork(NetworkConfig(no_ipa_blocks=2, node_embed_size=64,
                                     edge_embed_size=32, c_hidden=64,
                                     skip_embed_size=16))
    diffuser = SE3Diffusion(
        trans=R3Diffusion(R3Config(coordinate_scaling=0.1)),
        rotation=SO3Diffusion(SO3Config(num_sigma=20, num_omega=50,
                                        n_terms=100,
                                        cache_dir=tempfile.mkdtemp())),
        min_t=1e-2)
    return net, diffuser


def sampling_scaling():
    """Sharded sampler over 1/2/4/8 devices: identical ensembles."""
    from str2str_tpu.data.featurize import FeaturizeConfig, featurize_padded
    from str2str_tpu.io import protein as prot_io
    from str2str_tpu.parallel.mesh import make_mesh
    from str2str_tpu.sampling.sampler import Sampler, SamplerConfig
    from str2str_tpu.cli.sample import example_net_batch

    net, diffuser = build()
    prot = prot_io.from_pdb_string((REPO / "testdata" / "CLN025.pdb").read_text())
    feats = featurize_padded(
        prot, FeaturizeConfig(strip_missing_residues=False,
                              recenter_and_scale=False), bucket=16)
    params = net.init(jax.random.PRNGKey(0), example_net_batch(feats))
    scfg = SamplerConfig(num_timesteps=20, replica_per_batch=8, n_replica=8,
                         delta_min=0.3, delta_max=0.3, delta_step=0.1)
    key = jax.random.PRNGKey(5)

    outs = {}
    for n in (1, 2, 4, 8):
        sampler = Sampler(net, diffuser, scfg,
                          mesh=make_mesh(n) if n > 1 else None)
        t0 = time.perf_counter()
        outs[n] = np.asarray(sampler.sample_ensemble(params, key, feats)[0.3])
        outs[f"t{n}"] = time.perf_counter() - t0
    max_dev = max(float(np.max(np.abs(outs[n] - outs[1]))) for n in (2, 4, 8))
    print(json.dumps({
        "section": "sampling_scaling",
        "devices_tested": [1, 2, 4, 8],
        "max_deviation_vs_single_device": max_dev,
        "ok": bool(max_dev < 1e-3),
        "note": "replica batch sharded over the data axis; no collectives "
                "inside the anneal scan -> per-chip conf/s is "
                "device-count-invariant by construction",
    }))
    assert max_dev < 1e-3


def training_scaling():
    """DP train step over 1..8 devices: identical updates + psum cost model."""
    from str2str_tpu.parallel import mesh as mesh_lib
    from str2str_tpu.training.losses import LossConfig
    from str2str_tpu.training.trainer import TrainConfig, Trainer
    from tests.test_training import _batch, _init_params

    net, diffuser = build()
    rng = np.random.RandomState(0)
    batch = _batch(rng, B=8, L=16)
    params0 = _init_params(net, batch)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params0))

    losses = {}
    for n in (1, 8):
        trainer = Trainer(net, diffuser, LossConfig(),
                          TrainConfig(num_devices=n, seed=0))
        trainer.compile()
        params = jax.tree.map(jnp.array, params0)
        opt = trainer.optimizer.init(params)
        sharded = mesh_lib.shard_batch(batch, trainer.mesh)
        p, _, m = trainer.train_step(params, opt, jax.random.PRNGKey(3), sharded)
        losses[n] = float(m["loss"])

    # Gradient all-reduce cost model on a v5e pod slice: ring all-reduce
    # moves 2 * (N-1)/N * param_bytes per chip over ICI (~1.6 TB/s
    # bidirectional for v5e, 4 links x ~400 GB/s agg per chip plane).
    param_bytes = n_params * 4
    ici_bw = 400e9  # conservative per-chip ICI budget, bytes/s
    allreduce_s = 2 * (7 / 8) * param_bytes / ici_bw
    print(json.dumps({
        "section": "training_scaling",
        "loss_1dev": losses[1], "loss_8dev": losses[8],
        "loss_match": bool(abs(losses[1] - losses[8]) < 1e-4),
        "flagship_params": 17_380_000,
        "allreduce_model_s_per_step_17M_params":
            round(2 * (7 / 8) * 17_380_000 * 4 / ici_bw, 6),
        "note": "grads psum'd by XLA over the data axis; 17.4M fp32 params "
                "-> ~0.3 ms/step of ICI time, <3% of a measured ~12.6 ms "
                "B=8 L=256 forward-backward -> near-linear DP scaling "
                "expected through a v5e-8 slice",
    }))
    assert abs(losses[1] - losses[8]) < 1e-4


if __name__ == "__main__":
    sampling_scaling()
    training_scaling()
