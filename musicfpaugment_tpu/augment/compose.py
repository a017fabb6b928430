"""Transform composition (Compose / SomeOf / OneOf).

Counterpart of ref: augmentation/composition.py:11-169. The sequential chain
is pure and jit-safe: ``Compose.apply(key, samples, ...)`` splits one key per
transform and threads the batch through. SomeOf/OneOf pick *which transforms
run* per call — a host-level decision in the reference (python ``random``)
and here too (a handful of subsets at most, each a cached jit specialization).
"""

from __future__ import annotations

import random as _pyrandom
from typing import List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from musicfpaugment_tpu.augment.banks import IRBank, NoiseBank
from musicfpaugment_tpu.augment.transforms import BaseWaveformTransform

Array = jnp.ndarray


class BaseCompose:
    def __init__(
        self,
        transforms: Sequence[BaseWaveformTransform],
        shuffle: bool = False,
        p: float = 1.0,
    ):
        self.p = p
        self.shuffle = shuffle
        self.transforms = list(transforms)

    def __len__(self) -> int:
        return len(self.transforms)


class Compose(BaseCompose):
    """Sequential application (ref: composition.py:56-75)."""

    def apply(
        self,
        key: jax.Array,
        samples: Array,
        sample_rate: Optional[int] = None,
        noise_bank: Optional[NoiseBank] = None,
        ir_bank: Optional[IRBank] = None,
        order: Optional[Sequence[int]] = None,
    ) -> Array:
        indexes = list(order) if order is not None else list(range(len(self.transforms)))
        keys = jax.random.split(key, len(indexes))
        for k, i in zip(keys, indexes):
            samples = self.transforms[i](
                k, samples, sample_rate, noise_bank=noise_bank, ir_bank=ir_bank
            )
        return samples

    def __call__(self, key, samples, sample_rate=None, **banks):
        order = None
        if self.shuffle:
            order = list(range(len(self.transforms)))
            _pyrandom.shuffle(order)  # host-level, as in the reference
        return self.apply(key, samples, sample_rate, order=order, **banks)


class SomeOf(BaseCompose):
    """Randomly pick and apply a subset of transforms
    (ref: composition.py:78-151)."""

    def __init__(
        self,
        num_transforms: Union[int, Tuple[int, Optional[int]]],
        transforms: Sequence[BaseWaveformTransform],
        p: float = 1.0,
    ):
        super().__init__(transforms=transforms, p=p)
        self.all_transforms_indexes = list(range(len(self.transforms)))
        if isinstance(num_transforms, tuple):
            self.min_num_transforms = num_transforms[0]
            self.max_num_transforms = (
                num_transforms[1] if num_transforms[1] else len(transforms)
            )
        else:
            self.min_num_transforms = self.max_num_transforms = num_transforms
        assert self.min_num_transforms >= 1, "min_num_transforms must be >= 1"
        assert self.min_num_transforms <= len(transforms)
        assert self.max_num_transforms <= len(transforms)
        self.transform_indexes: List[int] = []

    def randomize_parameters(self) -> None:
        n = _pyrandom.randint(self.min_num_transforms, self.max_num_transforms)
        self.transform_indexes = sorted(
            _pyrandom.sample(self.all_transforms_indexes, n)
        )

    def __call__(self, key, samples, sample_rate=None, noise_bank=None, ir_bank=None):
        if _pyrandom.random() < self.p:
            self.randomize_parameters()
            keys = jax.random.split(key, max(len(self.transform_indexes), 1))
            for k, i in zip(keys, self.transform_indexes):
                samples = self.transforms[i](
                    k, samples, sample_rate, noise_bank=noise_bank, ir_bank=ir_bank
                )
        return samples


class OneOf(SomeOf):
    """Randomly pick one transform (ref: composition.py:154-169)."""

    def __init__(self, transforms: Sequence[BaseWaveformTransform], p: float = 1.0):
        super().__init__(num_transforms=1, transforms=transforms, p=p)
