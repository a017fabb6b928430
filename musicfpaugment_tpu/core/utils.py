"""Scalar/array DSP utilities (pure JAX, jit/vmap-safe).

TPU-native counterparts of the reference helpers in
``augmentation/utils.py`` (calculate_rms :23, rms_normalize :189-205,
dB/mel converters :32-51). All functions operate on the trailing (time)
axis and broadcast over leading batch/channel axes.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp

Array = jnp.ndarray


class ObjectDict(dict):
    """Attribute-style dict (ref: augmentation/utils.py:54-80)."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name, value):
        self[name] = value


def is_multichannel(samples: Array) -> bool:
    """ref: augmentation/utils.py:19-20."""
    return samples.shape[1] > 1


def calculate_rms(samples: Array) -> Array:
    """Root-mean-square over the trailing axis (ref: augmentation/utils.py:23-29)."""
    return jnp.sqrt(jnp.mean(jnp.square(samples), axis=-1))


def rms_normalize(samples: Array, eps: float = 1e-8) -> Array:
    """Power-normalize samples (ref: augmentation/utils.py:189-205)."""
    rms = jnp.sqrt(jnp.mean(jnp.square(samples), axis=-1, keepdims=True))
    return samples / (rms + eps)


def peak_normalize(samples: Array) -> Array:
    """Divide by per-example max-abs, skipping all-zero signals.

    Matches PeakNormalization semantics (ref:
    augmentation/transformations/peak_normalization.py:38-67): the loudest
    sample of each snippet becomes +/-1; identically-zero snippets pass
    through untouched.
    """
    peak = jnp.max(jnp.abs(samples), axis=-1, keepdims=True)
    return jnp.where(peak > 0.0, samples / jnp.where(peak > 0.0, peak, 1.0), samples)


def convert_decibels_to_amplitude_ratio(decibels: Array) -> Array:
    """dB -> linear amplitude (ref: augmentation/utils.py:32-33)."""
    return 10.0 ** (decibels / 20.0)


def convert_frequencies_to_mels(f: Array) -> Array:
    """Hz -> mel, O'Shaughnessy formula (ref: augmentation/utils.py:36-42)."""
    return 2595.0 * jnp.log10(1.0 + f / 700.0)


def convert_mels_to_frequencies(m: Array) -> Array:
    """mel -> Hz (ref: augmentation/utils.py:45-51)."""
    return 700.0 * (10.0 ** (m / 2595.0) - 1.0)


@functools.lru_cache(maxsize=None)
def next_fast_len(size: int) -> int:
    """Next 5-smooth (2/3/5-factor) integer >= size.

    Same contract as the reference's memoized helper
    (ref: augmentation/transformations/impulse_response.py:170-201); used to
    pick cheap FFT sizes for FFT convolution. Pure Python, evaluated at trace
    time only (shapes are static under jit).
    """
    assert isinstance(size, int) and size > 0
    next_size = size
    while True:
        remaining = next_size
        for n in (2, 3, 5):
            while remaining % n == 0:
                remaining //= n
        if remaining == 1:
            return next_size
        next_size += 1
