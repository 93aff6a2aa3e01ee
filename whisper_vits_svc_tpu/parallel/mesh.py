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
    """Multi-host bring-up (replaces tcp://localhost NCCL rendezvous)."""
    if coordinator_address and num_processes > 1:
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
    """Device-put a host batch pytree with batch-dim sharding."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def is_primary() -> bool:
    """Rank-0 gating (reference `rank == 0` checks)."""
    return jax.process_index() == 0
