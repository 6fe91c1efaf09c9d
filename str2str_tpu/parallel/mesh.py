"""Device mesh and sharding helpers (data parallelism over ICI).

The reference scales with Lightning DDP + NCCL (configs/trainer/ddp.yaml);
here data parallelism is a 1-D `jax.sharding.Mesh` over the `data` axis:
batches are sharded on axis 0, parameters replicated, and XLA inserts the
gradient all-reduce (psum over ICI) automatically under jit.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: int = -1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if num_devices and num_devices > 0:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data mesh axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch with its leading axis sharded over the mesh."""
    sh = batch_sharding(mesh)
    return {k: (jax.device_put(v, sh) if hasattr(v, "shape") and getattr(v, "ndim", 0) > 0
                else v)
            for k, v in batch.items()}
