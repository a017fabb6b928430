"""Colored-noise generation (pure JAX, explicit PRNG keys).

Counterpart of the reference's ``_gen_noise``
(ref: augmentation/transformations/colored_noise.py:12-38): white Gaussian
noise of one second at ``sample_rate``, shaped in the rfft domain by
``1 / linspace(1, sqrt(sr/2), nbins) ** f_decay``, RMS-normalized, tiled to
the requested length. Hidden torch RNG state becomes an explicit key.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from musicfpaugment_tpu.core.utils import rms_normalize

Array = jnp.ndarray


def gen_colored_noise(
    key: jax.Array,
    f_decay: Array,
    num_samples: int,
    sample_rate: int = 44100,
) -> Array:
    """Generate (num_samples,) colored noise with 1/f**f_decay spectrum."""
    noise = jax.random.normal(key, (sample_rate,), dtype=jnp.float32)
    spec = jnp.fft.rfft(noise)
    mask = 1.0 / (
        jnp.linspace(1.0, (sample_rate / 2.0) ** 0.5, spec.shape[0]) ** f_decay
    )
    noise = rms_normalize(jnp.fft.irfft(spec * mask, n=sample_rate))
    reps = int(math.ceil(num_samples / sample_rate))
    return jnp.tile(noise, reps)[:num_samples]


def batch_colored_noise(
    key: jax.Array,
    f_decays: Array,
    num_samples: int,
    sample_rate: int = 44100,
) -> Array:
    """(B,) f_decays -> (B, num_samples) colored noise, vmapped."""
    keys = jax.random.split(key, f_decays.shape[0])
    return jax.vmap(
        lambda k, fd: gen_colored_noise(k, fd, num_samples, sample_rate)
    )(keys, f_decays)
