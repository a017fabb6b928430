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

import functools
import os

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


def _mxu_fft_enabled() -> bool:
    """Route spectral products through the matmul (MXU) DFT instead of
    XLA's vector-unit FFT. Off by default; enable with MFPA_MXU_FFT=1."""
    return os.environ.get("MFPA_MXU_FFT", "0") == "1"


def _spectral_conv(signal: Array, kernel: Array, fft_size: int) -> Array:
    """Circular convolution at ``fft_size`` on the trailing axis (inputs are
    zero-padded up to fft_size; shorter inputs => linear convolution)."""
    if _mxu_fft_enabled():
        from musicfpaugment_tpu.core.mxu_fft import mxu_fft_convolve_full

        return mxu_fft_convolve_full(signal, kernel, fft_size)
    f_signal = jnp.fft.rfft(signal, n=fft_size)
    f_kernel = jnp.fft.rfft(kernel, n=fft_size)
    return jnp.fft.irfft(f_signal * f_kernel, n=fft_size)


def _os_chunk_size(m: int, n: int) -> int:
    """Pick the overlap-save FFT chunk size minimizing total FFT points.

    TPU FFT throughput is ~flat across sizes (measured), so total points
    processed is the right objective: chunks * chunk_fft * 2 (fwd+inv per
    chunk) + chunk_fft (kernel). Returns the single-shot size when chunking
    does not help (small signals or kernels comparable to the signal).
    """
    out_len = m + n - 1
    single = next_pow2(out_len)
    best_size = single
    best_cost = 3 * single  # 2 signal passes + 1 kernel pass
    size = next_pow2(2 * n)
    while size < single:
        useful = size - (n - 1)
        chunks = -(-out_len // useful)
        cost = chunks * size * 2 + size
        if cost < best_cost:
            best_cost = cost
            best_size = size
        size *= 2
    return best_size


def _fft_convolve_os(signal: Array, kernel: Array, chunk: int) -> Array:
    """Overlap-save linear convolution, trailing axis; returns 'full' length.

    Each length-``chunk`` circular convolution yields ``chunk - (n-1)`` valid
    outputs; chunks advance by that stride over the (n-1)-left-padded signal.
    Exact (no wraparound enters the kept region).
    """
    m = signal.shape[-1]
    n = kernel.shape[-1]
    out_len = m + n - 1
    useful = chunk - (n - 1)
    n_chunks = -(-out_len // useful)
    # left pad (n-1) so chunk j covers outputs [j*useful, j*useful + useful)
    total = (n_chunks - 1) * useful + chunk
    cfg = [(0, 0)] * (signal.ndim - 1) + [(n - 1, max(0, total - (m + n - 1)))]
    xp = jnp.pad(signal, cfg)
    idx = (
        np.arange(n_chunks)[:, None] * useful + np.arange(chunk)[None, :]
    )
    frames = xp[..., idx]  # (..., n_chunks, chunk)
    seg = _spectral_conv(frames, kernel[..., None, :], chunk)[..., n - 1 :]
    out = seg.reshape(*seg.shape[:-2], n_chunks * useful)
    return out[..., :out_len]


@functools.lru_cache(maxsize=None)
def _toeplitz_matrix(kernel_key: tuple, n: int, block: int) -> np.ndarray:
    """Banded (block + n - 1, block) Toeplitz of the reversed kernel:
    column o carries the kernel at rows [o, o + n)."""
    kc = np.asarray(kernel_key, np.float32)[::-1]
    t = np.zeros((block + n - 1, block), np.float32)
    for o in range(block):
        t[o : o + n, o] = kc
    return t


def toeplitz_conv1d(
    signal: Array, kernel, mode: str = "full", block: int = 512
) -> Array:
    """Short-kernel 1-D convolution as a blocked Toeplitz matmul.

    Same semantics as :func:`fft_convolve`, different machine: the signal is
    framed into ``block``-sample windows with ``n - 1`` overlap (the
    overlap-save layout) and each window is multiplied by the banded
    (block + n - 1, block) Toeplitz of the kernel — one large matmul the MXU
    executes at FLOP speed, instead of FFT passes the TPU runs on the
    memory-bound VPU (no MXU lowering for FFT). The dense matmul wastes a
    factor ``(block + n - 1) / n`` of its FLOPs on structural zeros, which
    at a 112-tap sinc kernel and a 197 TFLOP/s part is a fine trade: the x4
    sinc resample pair in the Demucs frontend measured ~3x faster than the
    overlap-save FFT formulation at (128, 1, 24k..96k) (see
    examples/profile_demucs.py). Requires a *static* host-side kernel
    (numpy); use fft_convolve for traced kernels or long ones.
    """
    kernel_np = np.asarray(kernel, np.float32).reshape(-1)
    m = signal.shape[-1]
    n = kernel_np.shape[-1]
    if mode == "full":
        truncate = m + n - 1
    elif mode == "valid":
        truncate = max(m, n) - min(m, n) + 1
    elif mode == "same":
        truncate = max(m, n)
    else:
        raise ValueError(f"Unknown mode: {mode}")
    to = m + n - 1  # full length; modes truncate from the center
    nb = -(-to // block)
    lead = signal.ndim - 1
    xp = jnp.pad(
        signal, [(0, 0)] * lead + [(n - 1, nb * block + n - 1 - m - (n - 1))]
    )
    from musicfpaugment_tpu.core.stft import frame

    xb = frame(xp, block + n - 1, block)  # (..., nb, block + n - 1)
    tmat = jnp.asarray(_toeplitz_matrix(tuple(kernel_np.tolist()), n, block))
    out = jnp.einsum(
        "...bt,to->...bo", xb, tmat, preferred_element_type=jnp.float32
    )
    out = out.reshape(*signal.shape[:-1], nb * block)
    start = (to - truncate) // 2
    return out[..., start : start + truncate]


def fft_convolve(signal: Array, kernel: Array, mode: str = "full") -> Array:
    """1-D convolution of ``signal`` by ``kernel`` via FFT.

    With ``m = signal.shape[-1]`` and ``n = kernel.shape[-1]`` the trailing
    size of the result is ``m + n - 1`` ('full'),
    ``max(m, n) - min(m, n) + 1`` ('valid') or ``max(m, n)`` ('same'),
    truncated from the center exactly like the reference.

    When the kernel is much shorter than the signal, the convolution runs as
    overlap-save over power-of-two chunks (~2x fewer FFT points than one
    padded-size FFT for the AugmentFP filter stages) — bit-identical
    semantics, chosen by a static cost model.
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
    single = next_pow2(padded_size)
    chunk = _os_chunk_size(m, n) if n <= m else single
    if chunk < single:
        result = _fft_convolve_os(signal, kernel, chunk)
    else:
        result = _spectral_conv(signal, kernel, single)

    start_idx = (padded_size - truncate) // 2
    return result[..., start_idx : start_idx + truncate]
