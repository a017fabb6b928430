"""Training losses: L1 + multi-resolution STFT (ref: training/loss.py).

The MR-STFT loss is the mean over three resolutions (fft 1024/2048/512, hop
120/240/50, win 600/1200/240) of spectral convergence (Frobenius) and
log-magnitude L1, each scaled by a factor (0.5 in training,
training/parameters.py:29-30). ``torch.stft``'s conventions are preserved:
periodic Hann of ``win_length`` zero-padded centered to ``fft_size``,
reflect-pad centering, magnitude clamped at 1e-7.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from musicfpaugment_tpu.core.stft import stft as _stft

Array = jnp.ndarray


@functools.lru_cache(maxsize=None)
def _torch_hann_padded(win_length: int, fft_size: int) -> np.ndarray:
    """torch.hann_window(win_length) (periodic), centered in fft_size zeros
    as torch.stft does when win_length < n_fft."""
    win = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(win_length) / win_length))
    left = (fft_size - win_length) // 2
    out = np.zeros(fft_size, np.float32)
    out[left : left + win_length] = win
    return out


def stft_magnitude(
    x: Array, fft_size: int, hop_size: int, win_length: int
) -> Array:
    """(B, T) -> (B, frames, bins) clamped magnitude (ref: loss.py:10-41)."""
    window = jnp.asarray(_torch_hann_padded(win_length, fft_size))
    spec = _stft(x, n_fft=fft_size, hop_length=hop_size, window=window)
    mag = jnp.sqrt(jnp.clip(jnp.abs(spec) ** 2, min=1e-7))
    return jnp.swapaxes(mag, -1, -2)


def spectral_convergence_loss(x_mag: Array, y_mag: Array) -> Array:
    """||y - x||_F / ||y||_F over the whole tensor (ref: loss.py:44-62)."""
    return jnp.linalg.norm((y_mag - x_mag).reshape(-1)) / jnp.linalg.norm(
        y_mag.reshape(-1)
    )


def log_stft_magnitude_loss(x_mag: Array, y_mag: Array) -> Array:
    """L1 between log magnitudes (ref: loss.py:65-83)."""
    return jnp.mean(jnp.abs(jnp.log(y_mag) - jnp.log(x_mag)))


def stft_loss(
    x: Array,
    y: Array,
    fft_size: int = 1024,
    shift_size: int = 120,
    win_length: int = 600,
) -> Tuple[Array, Array]:
    """(sc_loss, mag_loss) for one resolution (ref: loss.py:86-125)."""
    x_mag = stft_magnitude(x, fft_size, shift_size, win_length)
    y_mag = stft_magnitude(y, fft_size, shift_size, win_length)
    return (
        spectral_convergence_loss(x_mag, y_mag),
        log_stft_magnitude_loss(x_mag, y_mag),
    )


def multi_resolution_stft_loss(
    x: Array,
    y: Array,
    fft_sizes: Sequence[int] = (1024, 2048, 512),
    hop_sizes: Sequence[int] = (120, 240, 50),
    win_lengths: Sequence[int] = (600, 1200, 240),
    factor_sc: float = 0.1,
    factor_mag: float = 0.1,
) -> Tuple[Array, Array]:
    """Mean-over-resolutions (sc, mag) losses (ref: loss.py:128-186)."""
    assert len(fft_sizes) == len(hop_sizes) == len(win_lengths)
    sc_loss = 0.0
    mag_loss = 0.0
    for fs, ss, wl in zip(fft_sizes, hop_sizes, win_lengths):
        sc_l, mag_l = stft_loss(x, y, fs, ss, wl)
        sc_loss += sc_l
        mag_loss += mag_l
    n = len(fft_sizes)
    return factor_sc * sc_loss / n, factor_mag * mag_loss / n


def l1_loss(x: Array, y: Array) -> Array:
    return jnp.mean(jnp.abs(x - y))


def psnr(pred: Array, target: Array) -> Array:
    """Peak signal-to-noise ratio, micro-averaged, data range from the
    observed tensors (torchmetrics PeakSignalNoiseRatio(average='micro')
    semantics used at ref training/train.py:361-468)."""
    data_range = jnp.max(jnp.maximum(pred, target)) - jnp.min(
        jnp.minimum(pred, target)
    )
    mse = jnp.mean((pred - target) ** 2)
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(mse, 1e-12))
