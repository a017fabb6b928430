"""Parallelism layer: mesh construction, sharding placement, sharded ops."""

from musicfpaugment_tpu.parallel.augment_sharded import ShardedAugmenter
from musicfpaugment_tpu.parallel.mesh import (
    DATA_AXIS,
    batch_sharding,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)

__all__ = [
    "ShardedAugmenter",
    "DATA_AXIS",
    "batch_sharding",
    "make_mesh",
    "replicate",
    "replicated",
    "shard_batch",
]
