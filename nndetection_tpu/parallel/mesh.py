"""SPMD parallelism over a ``jax.sharding.Mesh``.

The TPU-native replacement for the reference's NCCL-under-Lightning DDP
(SURVEY.md §2.11, §5.8): the jitted train step is annotated with
``NamedSharding``s — batch sharded over the ``data`` axis, parameters
replicated — and XLA inserts the gradient all-reduce over ICI. An optional
``model`` axis is reserved for spatial/model sharding of very large patches.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a ``(data, model)`` mesh. Defaults to all devices on ``data``."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (
        f"mesh {n_data}x{n_model} needs more than {len(devices)} devices"
    )
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over ``data``; replicate the rest."""
    return NamedSharding(mesh, P("data"))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch pytree with the batch axis sharded over
    ``data``.

    Single-process: ``batch`` is the global batch, device_put splits it over
    the local devices. Multi-process: ``batch`` is this process's LOCAL rows
    (``distributed.local_batch_slice`` of the logical global batch) and the
    globally-shaped array is assembled via
    ``jax.make_array_from_process_local_data`` (SURVEY.md §5.8)."""
    if jax.process_count() > 1:
        from nndetection_tpu.parallel.distributed import shard_local_batch

        return shard_local_batch(mesh, batch)
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
