"""Device mesh and sharding helpers (data parallelism over ICI, multi-host
over DCN).

The reference scales with Lightning DDP + NCCL (configs/trainer/ddp.yaml);
here data parallelism is a 1-D `jax.sharding.Mesh` over the `data` axis:
batches are sharded on axis 0, parameters replicated, and XLA inserts the
gradient all-reduce (psum over ICI within a slice, DCN across slices)
automatically under jit.

Multi-host: call `init_distributed()` once per process before any jax
backend touch (pod slices / multi-process CPU testing). It wires
`jax.distributed.initialize`, after which `jax.devices()` spans the whole
job and `make_mesh` builds the global mesh; per-host batch loading feeds
`shard_batch`, which uses `device_put` with a NamedSharding (each host
provides its addressable shard).
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"

_DISTRIBUTED_INITIALIZED = False


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed for a multi-host job (reference analogue:
    Lightning spawning one DDP process per device, trainer/ddp.yaml:1-9).

    Arguments default from the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID); on TPU pods jax can autodetect all
    three. Returns True when running distributed, False for single-process
    (no coordinator configured). Safe to call more than once.
    """
    global _DISTRIBUTED_INITIALIZED
    if _DISTRIBUTED_INITIALIZED:
        return True
    coordinator_address = (coordinator_address
                           or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    num_processes = num_processes if num_processes is not None else int(
        os.environ.get("JAX_NUM_PROCESSES", "0") or 0)
    process_id = process_id if process_id is not None else int(
        os.environ.get("JAX_PROCESS_ID", "-1") or -1)
    if not coordinator_address and num_processes <= 1:
        return False  # single-process run
    kwargs = {}
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes > 0:
        kwargs["num_processes"] = num_processes
    if process_id >= 0:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    _DISTRIBUTED_INITIALIZED = True
    return True


def make_mesh(num_devices: int = -1, devices=None) -> Mesh:
    """1-D data mesh over the job's devices (global across hosts when
    `init_distributed` ran)."""
    devices = devices if devices is not None else jax.devices()
    if num_devices and num_devices > 0:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def make_mesh_2d(seq_devices: int, num_devices: int = -1,
                 devices=None) -> Mesh:
    """2-D (data, seq) mesh for sequence-sharded TRAINING: the batch is
    sharded over the major 'data' axis and the score network's O(L^2) edge
    tensors are column-sharded over the minor 'seq' axis inside shard_map
    (parallel/seq_shard.py). 'seq' is the minor axis so each sequence
    group's per-block softmax/output collectives ride adjacent-device ICI
    links. The reference has no analogue (its trunk is single-device,
    L <= 500, SURVEY §2.8/§5.7)."""
    from .seq_shard import SEQ_AXIS
    devices = devices if devices is not None else jax.devices()
    if num_devices and num_devices > 0:
        devices = devices[:num_devices]
    n = len(devices)
    if seq_devices < 1 or n % seq_devices:
        raise ValueError(
            f"{n} devices cannot form a (data, seq={seq_devices}) mesh; "
            f"seq_devices must divide the device count")
    arr = np.asarray(devices).reshape(n // seq_devices, seq_devices)
    return Mesh(arr, (DATA_AXIS, SEQ_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data mesh axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _place(v, sh: NamedSharding):
    """Place one host array under a global sharding.

    Single-process: plain device_put. Multi-process (jax.distributed): the
    host holds only ITS slice of the global batch (per-process batch
    division, reference protein_datamodule.py:160-166), so the global array
    is assembled from per-process shards with
    `jax.make_array_from_process_local_data` — device_put with a global
    NamedSharding would require the full global array on every host."""
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sh, np.asarray(v))
    return jax.device_put(v, sh)


def shard_stacked_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch of stacked micro-batches (K, B, ...) with the
    SECOND axis sharded over the data mesh (the leading K axis is scanned
    on-device by Trainer.train_steps_scan)."""
    sh = NamedSharding(mesh, P(None, DATA_AXIS))
    return {k: (_place(v, sh) if hasattr(v, "shape")
                and getattr(v, "ndim", 0) > 1 else v)
            for k, v in batch.items()}


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch with its leading axis sharded over the mesh."""
    sh = batch_sharding(mesh)
    return {k: (_place(v, sh) if hasattr(v, "shape") and getattr(v, "ndim", 0) > 0
                else v)
            for k, v in batch.items()}
