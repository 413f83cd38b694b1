"""Multi-process (multi-host / multi-slice) SPMD wiring.

The reference reaches multi-accelerator scale through Lightning's DDP
passthrough (``/root/reference/scripts/train.py:265-289``); the TPU-native
equivalent (SURVEY.md §5.8) is one JAX process per host joined into a single
SPMD program: ``jax.distributed.initialize`` builds the global device view,
each process feeds its local batch shard via
``jax.make_array_from_process_local_data``, XLA rides ICI within a slice and
DCN across slices, and host-side effects (checkpoints, logs, artifact writes)
are gated to process 0.

Environment contract (set by the launcher, e.g. GKE/TPU-VM tooling):

``NNDET_COORDINATOR``    host:port of process 0 (absent => single process)
``NNDET_NUM_PROCESSES``  total process count
``NNDET_PROCESS_ID``     this process's rank

On Cloud TPU VMs ``jax.distributed.initialize()`` auto-discovers all three;
the env vars are the explicit override used by tests and generic clusters.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_INITIALIZED = False


def initialize_from_env() -> bool:
    """Join the multi-process SPMD job described by ``NNDET_COORDINATOR`` /
    ``NNDET_NUM_PROCESSES`` / ``NNDET_PROCESS_ID``. Returns True when a
    multi-process runtime was initialized, False for the single-process case
    (no coordinator configured). Idempotent."""
    global _INITIALIZED
    if _INITIALIZED:
        return True
    coord = os.environ.get("NNDET_COORDINATOR")
    if not coord:
        return False
    num = int(os.environ["NNDET_NUM_PROCESSES"])
    pid = int(os.environ["NNDET_PROCESS_ID"])
    initialize(coord, num, pid)
    return True


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Explicit ``jax.distributed.initialize`` wrapper. On CPU backends the
    gloo collectives implementation is selected so multi-process meshes work
    in tests (subprocess-spawned 2-process fixtures) exactly like on TPU."""
    global _INITIALIZED
    if _INITIALIZED:
        return
    try:
        # no-op on TPU; required for cross-process CPU collectives
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:  # knob absent on this jax build: TPU path unaffected
        pass
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _INITIALIZED = True


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    """True on the process that owns host-side effects (checkpoints, logs,
    artifact exports) — the reference's implicit rank-0-only Lightning
    behaviors, made explicit."""
    return jax.process_index() == 0


def local_batch_size(global_batch_size: int) -> int:
    """Per-process share of the global batch. The global batch must divide
    evenly — silent remainder-dropping would skew the gradient estimate."""
    n = jax.process_count()
    if global_batch_size % n:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by "
            f"{n} processes"
        )
    return global_batch_size // n


def local_batch_slice(global_batch_size: int) -> slice:
    """The contiguous rows of the global batch this process feeds (row-major
    over the ``data`` mesh axis, matching ``make_mesh``'s device order)."""
    per = local_batch_size(global_batch_size)
    pid = jax.process_index()
    return slice(pid * per, (pid + 1) * per)


def shard_local_batch(mesh: Mesh, local_batch, spec: P = P("data")):
    """Assemble the GLOBAL sharded batch from this process's local rows.

    Every process passes its own slice (``local_batch_slice`` of the logical
    global batch); the returned ``jax.Array``s are globally-shaped with
    device-local shards only — the multi-process replacement for
    ``mesh.shard_batch``'s single-process ``device_put``.
    """
    sharding = NamedSharding(mesh, spec)
    n = jax.process_count()

    def put(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * n,) + x.shape[1:]
        return jax.make_array_from_process_local_data(
            sharding, x, global_shape=global_shape
        )

    return jax.tree_util.tree_map(put, local_batch)
