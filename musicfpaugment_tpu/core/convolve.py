"""FFT convolution on the trailing axis (pure JAX).

Semantics match the reference's pyro-derived helper
(ref: augmentation/transformations/impulse_response.py:119-164): rfft at a
padded size, pointwise product, irfft, centered truncation per mode.
Broadcasts over leading axes; shapes are static under jit.

TPU note: the reference rounds the FFT size up to a 2/3/5-smooth length
(``next_fast_len``) — a CPU-FFT optimization. XLA's TPU FFT only has a fast
path for power-of-two sizes and otherwise falls back to a materialized
O(n^2) DFT matmul (an 81000-point FFT tried to allocate an 81000x81000 f32
matrix = 26 GB). We therefore round up to the next power of two; any FFT
size >= m + n - 1 yields the identical linear convolution after truncation.
"""

from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray


def next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


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
    fast_fft_size = next_pow2(padded_size)
    f_signal = jnp.fft.rfft(signal, n=fast_fft_size)
    f_kernel = jnp.fft.rfft(kernel, n=fast_fft_size)
    result = jnp.fft.irfft(f_signal * f_kernel, n=fast_fft_size)

    start_idx = (padded_size - truncate) // 2
    return result[..., start_idx : start_idx + truncate]
