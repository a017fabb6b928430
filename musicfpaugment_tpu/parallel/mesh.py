"""Device mesh + sharding helpers (the framework's parallelism layer).

The reference has no real parallelism — its torch.distributed helpers are
never initialized (ref: training/utils.py:11-28; SURVEY.md §2.6). Here
data-parallel training runs over a 1-D ``jax.sharding.Mesh`` on ICI:
batches are sharded over the ``data`` axis, parameters are replicated, and
XLA's SPMD partitioner inserts the gradient ``psum`` automatically because
the updated (replicated-sharded) state is a jit output. The same code path
scales to multi-host pods: :func:`init_multihost` wires
``jax.distributed.initialize`` and ``make_mesh`` then builds the global
mesh over every pod device (gradient all-reduce rides ICI within a slice
and DCN across slices, inserted by the same SPMD partitioner — no code in
the train step changes).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"

_multihost_initialized = False


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Join a multi-host pod (``--multihost`` in the train CLI).

    Wraps ``jax.distributed.initialize``. On TPU pods every argument is
    discovered from the runtime environment; elsewhere they come from the
    arguments or the standard ``JAX_COORDINATOR_ADDRESS`` /
    ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID`` variables. Idempotent.
    Returns the process index. After this, ``make_mesh()`` sees the global
    device set and the data-parallel layout extends across hosts unchanged
    (per-host batch feeding stays local: each process feeds its own shard
    via ``jax.make_array_from_process_local_data`` if loaders are
    host-local).
    """
    global _multihost_initialized
    if not _multihost_initialized:
        jax.distributed.initialize(
            coordinator_address=coordinator_address
            or os.environ.get("JAX_COORDINATOR_ADDRESS"),
            num_processes=num_processes
            or _env_int("JAX_NUM_PROCESSES"),
            process_id=process_id if process_id is not None
            else _env_int("JAX_PROCESS_ID"),
        )
        _multihost_initialized = True
    return jax.process_index()


def _env_int(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v is not None else None


def make_mesh(num_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first ``num_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis split over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a pytree of host arrays with the batch axis sharded over ICI."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def replicate(tree: Any, mesh: Mesh) -> Any:
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
