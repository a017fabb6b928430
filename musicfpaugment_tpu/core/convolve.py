"""FFT convolution on the trailing axis (pure JAX).

Semantics match the reference's pyro-derived helper
(ref: augmentation/transformations/impulse_response.py:119-164): rfft at a
2/3/5-smooth padded size, pointwise product, irfft, centered truncation per
mode. Broadcasts over leading axes; shapes are static under jit.
"""

from __future__ import annotations

import jax.numpy as jnp

from musicfpaugment_tpu.core.utils import next_fast_len

Array = jnp.ndarray


def fft_convolve(signal: Array, kernel: Array, mode: str = "full") -> Array:
    """1-D convolution of ``signal`` by ``kernel`` via FFT.

    With ``m = signal.shape[-1]`` and ``n = kernel.shape[-1]`` the trailing
    size of the result is ``m + n - 1`` ('full'),
    ``max(m, n) - min(m, n) + 1`` ('valid') or ``max(m, n)`` ('same'),
    truncated from the center exactly like the reference.
    """
    m = signal.shape[-1]
    n = kernel.shape[-1]
    if mode == "full":
        truncate = m + n - 1
    elif mode == "valid":
        truncate = max(m, n) - min(m, n) + 1
    elif mode == "same":
        truncate = max(m, n)
    else:
        raise ValueError(f"Unknown mode: {mode}")

    padded_size = m + n - 1
    fast_fft_size = next_fast_len(padded_size)
    f_signal = jnp.fft.rfft(signal, n=fast_fft_size)
    f_kernel = jnp.fft.rfft(kernel, n=fast_fft_size)
    result = jnp.fft.irfft(f_signal * f_kernel, n=fast_fft_size)

    start_idx = (padded_size - truncate) // 2
    return result[..., start_idx : start_idx + truncate]
