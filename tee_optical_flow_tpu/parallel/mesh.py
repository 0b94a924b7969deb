"""Device mesh construction and sharding policy.

This replaces the reference's entire distributed stack — torch DDP over
gloo with a manual 2-GPU model split (DDP_splitgpu_train_finetune_
noprompt.py:44-49, :53-56; image_encoder.py:99-104 block placement) — with
the TPU-native formulation: one ``jax.sharding.Mesh`` with a ``data`` axis
(DP: batch sharded, gradients psum'd by XLA) and a ``model`` axis (the
capability the manual split provided, expressed as weight sharding instead
of device-pinned Python). Collectives are inserted by XLA from sharding
annotations and ride ICI; multi-host process groups come from
``jax.distributed.initialize`` instead of a gloo rendezvous.

The embarrassingly-parallel cohort sharding (nchunks file splits,
calculate_optical_flow.py:266-269) maps to ``host_shard_list``.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..exceptions import ShardingError


def make_mesh(data_axis: Optional[int] = None, model_axis: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data_axis is None:
        if n % model_axis:
            raise ShardingError(
                f"{n} devices not divisible by model_axis={model_axis}")
        data_axis = n // model_axis
    if data_axis * model_axis != n:
        raise ShardingError(
            f"mesh {data_axis}x{model_axis} != {n} devices")
    grid = np.asarray(devices).reshape(data_axis, model_axis)
    return Mesh(grid, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch/frame) axis over 'data'."""
    spec = P("data", *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place every array in a batch pytree with its leading axis sharded
    over the data axis (padding is the caller's job: leading dim must be
    divisible by the data axis size)."""
    def place(x):
        return jax.device_put(x, batch_sharding(mesh, np.ndim(x)))

    return jax.tree.map(place, batch)


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (the gloo init_process_group equivalent).
    No-op for single-process runs."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id)


def host_shard_list(items: Sequence, nchunks: int, chunk_index: int) -> List:
    """Deterministic nchunks split of a work list (the reference's batch-job
    sharding pattern); no in-band communication."""
    arr = np.array_split(np.asarray(list(items), dtype=object), nchunks)
    if chunk_index >= len(arr):
        return []
    return list(arr[chunk_index])
