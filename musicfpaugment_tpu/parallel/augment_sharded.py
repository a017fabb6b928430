"""Multi-chip batched augmentation: AugmentFP sharded over a device mesh.

The BASELINE north star (>=50k augmented 8s clips/sec on v5e-8) is reached by
splitting the query/clip batch over the ``data`` mesh axis: every chip runs
the identical jitted chain on its shard, noise/IR banks are replicated, and
no collectives are needed (augmentation is embarrassingly batch-parallel —
the ICI stays free for the training all-reduce).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from musicfpaugment_tpu.augment.pipeline import AugmentFP
from musicfpaugment_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated,
)


class ShardedAugmenter:
    """Wraps an :class:`AugmentFP` for data-parallel execution over a mesh.

    ``batch_augment`` accepts host or device arrays whose batch dimension is
    divisible by the mesh size; outputs keep the sharded layout (device-side
    consumers like the training step use them in place).
    """

    def __init__(self, augmenter: AugmentFP, mesh=None):
        self.augmenter = augmenter
        self.mesh = mesh if mesh is not None else make_mesh()
        rep = replicated(self.mesh)
        dsh = batch_sharding(self.mesh)
        if self.mesh.devices.size > 1:
            self._jitted = jax.jit(
                augmenter._chain,
                in_shardings=(rep, dsh, rep, rep),
                out_shardings=dsh,
            )
        else:
            # sharding-annotated executables are pathologically slow through
            # the single-chip tunnel; plain jit is identical on one device
            self._jitted = jax.jit(augmenter._chain)
        # place the banks once
        self._noise_bank = jax.device_put(augmenter.noise_bank, rep)
        self._ir_bank = jax.device_put(augmenter.ir_bank, rep)

    @property
    def num_devices(self) -> int:
        return self.mesh.devices.size

    def batch_augment(self, waveforms, key: Optional[jax.Array] = None):
        waveforms = jnp.asarray(waveforms, jnp.float32)
        if waveforms.shape[0] % self.num_devices != 0:
            raise ValueError(
                f"batch {waveforms.shape[0]} not divisible by mesh size "
                f"{self.num_devices}"
            )
        if key is None:
            key = self.augmenter._next_key()
        waveforms = jax.device_put(waveforms, batch_sharding(self.mesh))
        return self._jitted(key, waveforms, self._noise_bank, self._ir_bank)
