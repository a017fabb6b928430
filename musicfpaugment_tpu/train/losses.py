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


@functools.lru_cache(maxsize=None)
def _windowed_dft_mats(win_length: int, fft_size: int) -> Tuple[np.ndarray, np.ndarray]:
    """(win_length, fft_size//2 + 1) cos/sin DFT matrices with the periodic
    Hann folded in. Only the window's support contributes — torch.stft's
    centered zero-padding to ``fft_size`` is a pure time shift, which the
    magnitude is invariant to — so the matmul contracts over ``win_length``
    samples, not ``fft_size``."""
    win = 0.5 * (
        1.0 - np.cos(2.0 * np.pi * np.arange(win_length) / win_length)
    )
    t = np.arange(win_length)[:, None]
    k = np.arange(fft_size // 2 + 1)[None, :]
    ang = 2.0 * np.pi * t * k / fft_size
    return (
        (win[:, None] * np.cos(ang)).astype(np.float32),
        (win[:, None] * np.sin(ang)).astype(np.float32),
    )


def stft_magnitude_matmul(
    x: Array, fft_size: int, hop_size: int, win_length: int
) -> Array:
    """MXU formulation of :func:`stft_magnitude`: window-support frames
    times windowed cos/sin DFT matrices, |.| from the two products. TPU has
    no MXU lowering for FFT — the rfft runs on the memory-bound VPU — while
    this is two (B*frames, win_length) x (win_length, bins) matmuls the MXU
    streams at FLOP speed; measured ~1.5x the whole Demucs train step (see
    models/demucs.py stage notes). Numerically within ~1e-4 of the rfft
    path (float-sum order; parity test pins it)."""
    from musicfpaugment_tpu.core.stft import frame

    mc, ms = _windowed_dft_mats(win_length, fft_size)
    pad = [(0, 0)] * (x.ndim - 1) + [(fft_size // 2, fft_size // 2)]
    xp = jnp.pad(x, pad, mode="reflect")
    num_frames = 1 + (xp.shape[-1] - fft_size) // hop_size
    left = (fft_size - win_length) // 2
    frames = frame(
        xp[..., left : left + (num_frames - 1) * hop_size + win_length],
        win_length,
        hop_size,
    )
    re = jnp.einsum(
        "...tw,wk->...tk", frames, jnp.asarray(mc),
        preferred_element_type=jnp.float32,
    )
    im = jnp.einsum(
        "...tw,wk->...tk", frames, jnp.asarray(ms),
        preferred_element_type=jnp.float32,
    )
    return jnp.sqrt(jnp.clip(re * re + im * im, min=1e-7))


def stft_magnitude(
    x: Array, fft_size: int, hop_size: int, win_length: int, use_matmul=None
) -> Array:
    """(B, T) -> (B, frames, bins) clamped magnitude (ref: loss.py:10-41).

    ``use_matmul=None`` auto-selects the MXU DFT-matmul formulation on TPU
    backends (:func:`stft_magnitude_matmul`) and the rfft path elsewhere.
    """
    if use_matmul is None:
        import os

        env = os.environ.get("MFPA_STFT_MATMUL")
        if env in ("0", "1"):
            use_matmul = env == "1"
        else:
            import jax

            # "axon" is this image's remote-TPU platform name
            use_matmul = jax.default_backend() in ("tpu", "axon")
    if use_matmul:
        return stft_magnitude_matmul(x, fft_size, hop_size, win_length)
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
