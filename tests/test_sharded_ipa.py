"""Sequence-sharded IPA attention: exact match vs the unsharded oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from str2str_tpu.ops import ipa_attention as IA
from str2str_tpu.ops.sharded_ipa import sharded_ipa_attention
from str2str_tpu.parallel.mesh import make_mesh


def test_sharded_ipa_matches_oracle(rng):
    n_dev = len(jax.devices())
    if n_dev < 2:
        pytest.skip("needs multiple devices")
    B, L, H, C, Pq, Pv, Cz = 2, 32, 4, 16, 4, 6, 24

    def r(*s, sc=0.5):
        return jnp.asarray(rng.randn(*s) * sc, jnp.float32)

    mask = np.ones((B, L), np.float32)
    mask[:, -5:] = 0
    args = (r(B, L, H * C), r(B, L, H * C), r(B, L, H * C),
            r(B, L, H * 3 * Pq), r(B, L, H * 3 * Pq), r(B, L, H * 3 * Pv),
            r(B, L, L, Cz), r(Cz, H), r(H, sc=0.1), r(Cz, Cz // 4),
            r(Cz // 4, sc=0.1), jnp.abs(r(H)) + 0.5, jnp.asarray(mask))

    ref = IA.ipa_attention_reference(*args)
    mesh = make_mesh(8 if n_dev >= 8 else n_dev)
    out = sharded_ipa_attention(mesh, *args)
    m = mask[..., None]
    for name, a, b in zip(("o", "opt", "opair"), ref, out):
        np.testing.assert_allclose(np.asarray(a) * m, np.asarray(b) * m,
                                   atol=3e-5, rtol=1e-4, err_msg=name)
