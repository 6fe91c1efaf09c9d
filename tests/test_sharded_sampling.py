"""Multi-device sampling: batch sharded over the data mesh axis."""
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from str2str_tpu.data.featurize import FeaturizeConfig, featurize_padded
from str2str_tpu.diffusion.r3 import R3Config, R3Diffusion
from str2str_tpu.diffusion.se3 import SE3Diffusion
from str2str_tpu.diffusion.so3 import SO3Config, SO3Diffusion
from str2str_tpu.io import protein as prot_io
from str2str_tpu.model.network import NetworkConfig, ScoreNetwork
from str2str_tpu.parallel.mesh import make_mesh
from str2str_tpu.sampling.sampler import Sampler, SamplerConfig

pytestmark = pytest.mark.slow


def test_sharded_sampling_matches_unsharded(fixture_pdb):
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    prot = prot_io.from_pdb_string(fixture_pdb.read_text())
    feats = featurize_padded(
        prot, FeaturizeConfig(strip_missing_residues=False,
                              recenter_and_scale=False), bucket=16)
    net = ScoreNetwork(NetworkConfig(no_ipa_blocks=2, node_embed_size=64,
                                     edge_embed_size=32, c_hidden=64,
                                     skip_embed_size=16))
    diffuser = SE3Diffusion(
        trans=R3Diffusion(R3Config(coordinate_scaling=0.1)),
        rotation=SO3Diffusion(SO3Config(num_sigma=20, num_omega=50, n_terms=100,
                                        cache_dir=tempfile.mkdtemp())),
        min_t=1e-2)
    scfg = SamplerConfig(num_timesteps=10, replica_per_batch=8, n_replica=8,
                         delta_min=0.3, delta_max=0.3, delta_step=0.1)

    from str2str_tpu.cli.sample import example_net_batch
    params = net.init(jax.random.PRNGKey(0), example_net_batch(feats))

    plain = Sampler(net, diffuser, scfg)
    sharded = Sampler(net, diffuser, scfg, mesh=make_mesh(len(jax.devices())))
    key = jax.random.PRNGKey(5)
    out_plain = plain.sample_ensemble(params, key, feats)
    out_sharded = sharded.sample_ensemble(params, key, feats)
    np.testing.assert_allclose(out_plain[0.3], out_sharded[0.3], atol=1e-4)


def test_sharded_chained_sampling_matches_unsharded(fixture_pdb):
    """Chained-delta single-program mode under the data mesh: bit-identical
    to the unsharded chained run (replicas shard across devices; the
    schedule is per-step scalar and replicated)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    prot = prot_io.from_pdb_string(fixture_pdb.read_text())
    feats = featurize_padded(
        prot, FeaturizeConfig(strip_missing_residues=False,
                              recenter_and_scale=False), bucket=16)
    net = ScoreNetwork(NetworkConfig(no_ipa_blocks=2, node_embed_size=64,
                                     edge_embed_size=32, c_hidden=64,
                                     skip_embed_size=16))
    diffuser = SE3Diffusion(
        trans=R3Diffusion(R3Config(coordinate_scaling=0.1)),
        rotation=SO3Diffusion(SO3Config(num_sigma=20, num_omega=50, n_terms=100,
                                        cache_dir=tempfile.mkdtemp())),
        min_t=1e-2)
    scfg = SamplerConfig(num_timesteps=10, replica_per_batch=8, n_replica=8,
                         delta_min=0.3, delta_max=0.4, delta_step=0.1)

    from str2str_tpu.cli.sample import example_net_batch
    params = net.init(jax.random.PRNGKey(0), example_net_batch(feats))

    plain = Sampler(net, diffuser, scfg)
    sharded = Sampler(net, diffuser, scfg, mesh=make_mesh(len(jax.devices())))
    key = jax.random.PRNGKey(7)
    out_plain = plain.sample_ensemble_chained(params, key, feats)
    out_sharded = sharded.sample_ensemble_chained(params, key, feats)
    for d in (0.3, 0.4):
        np.testing.assert_allclose(out_plain[d], out_sharded[d], atol=1e-4)
