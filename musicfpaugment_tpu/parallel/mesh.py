"""Device mesh + sharding helpers (the framework's parallelism layer).

The reference has no real parallelism — its torch.distributed helpers are
never initialized (ref: training/utils.py:11-28; SURVEY.md §2.6). Here
data-parallel training runs over a 1-D ``jax.sharding.Mesh`` on ICI:
batches are sharded over the ``data`` axis, parameters are replicated, and
XLA's SPMD partitioner inserts the gradient ``psum`` automatically because
the updated (replicated-sharded) state is a jit output. The same code path
scales to multi-host pods via ``jax.distributed.initialize`` + a global mesh.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


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
