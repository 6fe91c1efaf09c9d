"""Real multi-process (multi-host analogue) data-parallel training.

Spawns 2 OS processes that form a jax.distributed job on CPU (2 virtual
devices each -> a 4-device global mesh), each feeding only ITS half of the
global batch through `shard_batch` (make_array_from_process_local_data),
and asserts the resulting gradient step matches a single-process run on the
full batch bit-for-bit. This is the multi-process coverage the reference
never had (its only story is Lightning `ddp_spawn` config, SURVEY §4).
"""
import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]

WORKER = r"""
import os, sys, json
import numpy as np

proc_id = int(sys.argv[1])
nprocs = int(sys.argv[2])
port = sys.argv[3]
out_path = sys.argv[4]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                           num_processes=nprocs, process_id=proc_id)

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
sys.path.insert(0, "@@REPO@@")
from str2str_tpu.parallel import mesh as mesh_lib

mesh = mesh_lib.make_mesh(-1)
assert len(jax.devices()) == 4, jax.devices()

rng = np.random.RandomState(0)
W0 = rng.randn(8, 8).astype(np.float32)
X = rng.randn(4, 8).astype(np.float32)   # global batch
Y = rng.randn(4, 8).astype(np.float32)

# This process's local half of the global batch (per-process division).
lo = proc_id * 2
local = {"x": X[lo:lo + 2], "y": Y[lo:lo + 2]}
batch = mesh_lib.shard_batch(local, mesh)

W = jax.device_put(jnp.asarray(W0), NamedSharding(mesh, P()))

@jax.jit
def step(W, batch):
    def loss(W):
        pred = batch["x"] @ W
        return jnp.mean((pred - batch["y"]) ** 2)
    l, g = jax.value_and_grad(loss)(W)
    return l, W - 0.1 * g

l, W1 = step(W, batch)
res = {"loss": float(l),
       "W1_sum": float(jnp.sum(W1)),
       "W1_00": float(W1[0, 0])}
if proc_id == 0:
    with open(out_path, "w") as f:
        json.dump(res, f)
jax.effects_barrier()
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_matches_single_process(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER.replace("@@REPO@@", str(REPO)))
    out = tmp_path / "out.json"

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), "2", str(port), str(out)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    outs = [p.communicate(timeout=300)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-2000:]
    res = json.loads(out.read_text())

    # Single-process oracle on the full batch.
    rng = np.random.RandomState(0)
    W0 = rng.randn(8, 8).astype(np.float32)
    X = rng.randn(4, 8).astype(np.float32)
    Y = rng.randn(4, 8).astype(np.float32)
    pred = X @ W0
    loss = np.mean((pred - Y) ** 2)
    g = 2.0 / pred.size * X.T @ (pred - Y)
    W1 = W0 - 0.1 * g
    np.testing.assert_allclose(res["loss"], loss, rtol=1e-5)
    np.testing.assert_allclose(res["W1_sum"], W1.sum(), rtol=1e-4)
    np.testing.assert_allclose(res["W1_00"], W1[0, 0], rtol=1e-4)
