"""Config -> framework objects (the reference uses hydra.instantiate;
we build explicitly from the structured config tree)."""
from __future__ import annotations

import os
from pathlib import Path

from .config.core import Config
from .diffusion.r3 import R3Config, R3Diffusion
from .diffusion.se3 import SE3Diffusion
from .diffusion.so3 import SO3Config, SO3Diffusion
from .model.network import NetworkConfig, ScoreNetwork
from .sampling.sampler import Sampler, SamplerConfig


def build_network(cfg: Config) -> ScoreNetwork:
    n = cfg.model.net
    return ScoreNetwork(NetworkConfig(
        init_embed_size=n.init_embed_size,
        node_embed_size=n.node_embed_size,
        edge_embed_size=n.edge_embed_size,
        num_bins=n.num_bins, min_bin=n.min_bin, max_bin=n.max_bin,
        self_conditioning=n.self_conditioning,
        coordinate_scaling=n.coordinate_scaling,
        no_ipa_blocks=n.no_ipa_blocks,
        skip_embed_size=n.skip_embed_size,
        transformer_num_heads=n.transformer_num_heads,
        transformer_num_layers=n.transformer_num_layers,
        c_hidden=n.c_hidden, no_heads=n.no_heads,
        no_qk_points=n.no_qk_points, no_v_points=n.no_v_points,
        dropout=n.dropout, dtype=n.dtype,
        use_pallas=n.get("use_pallas", "auto"),
        use_pallas_ipa=n.get("use_pallas_ipa", "off"),
        seq_axis=n.get("seq_axis", "") or "",
        edge_dots_int8=bool(n.get("edge_dots_int8", False)),
    ))


def build_diffuser(cfg: Config) -> SE3Diffusion:
    d = cfg.model.diffuser
    cache_dir = os.path.expanduser(str(d.rotation.cache_dir or "~/.cache/str2str_tpu"))
    return SE3Diffusion(
        trans=R3Diffusion(R3Config(
            min_b=d.trans.min_b, max_b=d.trans.max_b,
            coordinate_scaling=d.trans.coordinate_scaling)),
        rotation=SO3Diffusion(SO3Config(
            min_sigma=d.rotation.min_sigma, max_sigma=d.rotation.max_sigma,
            num_sigma=d.rotation.num_sigma, num_omega=d.rotation.num_omega,
            n_terms=d.rotation.get("n_terms", 1000),
            schedule=d.rotation.schedule,
            use_cached_score=d.rotation.use_cached_score,
            cache_dir=cache_dir)),
        min_t=d.min_t,
    )


def build_sampler(cfg: Config, net=None, diffuser=None) -> Sampler:
    i = cfg.model.inference
    net = net or build_network(cfg)
    seq_mesh = None
    if getattr(net.cfg, "seq_axis", ""):
        # Long-context mode: the whole anneal runs inside shard_map with the
        # edge tensors column-sharded over every available device.
        import jax
        import numpy as _np
        from jax.sharding import Mesh
        seq_mesh = Mesh(_np.array(jax.devices()), (net.cfg.seq_axis,))
    return Sampler(
        net,
        diffuser or build_diffuser(cfg),
        SamplerConfig(
            delta_min=i.delta_min, delta_max=i.delta_max, delta_step=i.delta_step,
            n_replica=i.n_replica, replica_per_batch=i.replica_per_batch,
            num_timesteps=i.num_timesteps, noise_scale=i.noise_scale,
            probability_flow=i.probability_flow,
            self_conditioning=i.self_conditioning,
            min_t=i.min_t, backward_only=i.backward_only,
            max_steps_per_dispatch=int(
                i.get("max_steps_per_dispatch", 1000) or 0),
            auto_batch_ref_len=int(i.get("auto_batch_ref_len", 0) or 0),
            auto_batch_max=int(i.get("auto_batch_max", 400) or 400),
        ),
        seq_mesh=seq_mesh)


def load_params(cfg: Config, net: ScoreNetwork, example_batch=None, rng_seed: int = 0):
    """Load params from cfg.ckpt_path (orbax dir, torch .pth, or .npz), or random-init."""
    import jax

    ckpt_path = cfg.get("ckpt_path") or ""
    if ckpt_path:
        if not Path(str(ckpt_path)).exists():
            raise FileNotFoundError(
                f"ckpt_path={ckpt_path!r} does not exist "
                "(set ckpt_path= empty for random init)")
        if str(ckpt_path).endswith((".pth", ".pt", ".ckpt")):
            from .utils.torch_convert import load_torch_checkpoint
            return load_torch_checkpoint(str(ckpt_path))
        if str(ckpt_path).endswith(".npz"):
            # Compact committed-weights format (trained in-repo checkpoint).
            import numpy as np
            from .utils.checkpoints import load_params_npz
            return load_params_npz(str(ckpt_path), cast=np.float32)
        from .utils.checkpoints import load_checkpoint
        return load_checkpoint(str(ckpt_path))["params"]
    if example_batch is None:
        raise ValueError("no checkpoint; need an example batch to random-init")
    return net.init(jax.random.PRNGKey(rng_seed), example_batch)
