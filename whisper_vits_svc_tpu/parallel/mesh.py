"""Device mesh + sharding rules — the NCCL/DDP replacement.

The reference scales with torch DDP over NCCL (vits_extend/train.py:64-66,
:138-140; configs/base.yaml:68-71). TPU-natively that whole stack collapses
into: a (data, model) jax.sharding.Mesh, batch arrays sharded on `data`,
params replicated (or sharded on `model` for the big feature extractors), and
XLA inserting psum gradient all-reduces over ICI/DCN inside the jitted train
step. Multi-host init goes through jax.distributed.initialize.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int = 1, process_id: int = 0) -> None:
    """Multi-host bring-up (replaces tcp://localhost NCCL rendezvous).

    Idempotent: callers that must initialize before their first backend touch
    (jax.distributed.initialize rejects later calls) can do so themselves and
    still run the training loop, which re-invokes this."""
    if coordinator_address and num_processes > 1:
        from jax._src import distributed as _dist

        if getattr(_dist.global_state, "client", None) is not None:
            return  # already initialized (e.g. by the launching script)
        jax.distributed.initialize(coordinator_address, num_processes, process_id)


def create_mesh(num_data: int | None = None, num_model: int = 1,
                devices: list | None = None) -> Mesh:
    """(data, model) mesh over all devices; data axis fills what model leaves."""
    devices = devices if devices is not None else jax.devices()
    if num_data is None:
        num_data = len(devices) // num_model
    assert num_data * num_model == len(devices), (
        f"{len(devices)} devices != {num_data} x {num_model}"
    )
    arr = np.asarray(devices).reshape(num_data, num_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim split across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Device-put a host batch pytree with batch-dim sharding.

    Single-process: a plain sharded device_put. Multi-process (after
    initialize_distributed): each process holds only ITS rank's shard (the
    rank-sharded BucketBatcher output); the global array is assembled with
    jax.make_array_from_process_local_data — the global batch dim is
    local_batch * process_count, and process-major device ordering in the
    mesh aligns rank r's rows with its addressable devices. This is the
    multi-host half of the NCCL-DDP replacement (SURVEY.md §5.8)."""
    sh = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sh), batch)

    def put(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(sh, x, global_shape)

    return jax.tree.map(put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def is_primary() -> bool:
    """Rank-0 gating (reference `rank == 0` checks)."""
    return jax.process_index() == 0
