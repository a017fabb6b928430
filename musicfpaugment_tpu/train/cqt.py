"""Constant-Q transform + CQT losses (ref: training/loss.py:189-322).

The reference wraps nnAudio's ``CQT2010v2``; these losses are defined but
unused by default (mirroring the reference, SURVEY.md §7 de-scoped quirks).
Here the CQT is a direct framed filterbank: log-spaced complex Morlet-style
kernels (Q = 1/(2^(1/bpo) - 1), Hann-windowed complex exponentials,
l1-normalized), applied as one (frames x kernel_len) @ (kernel_len x bins)
complex matmul — MXU-friendly. Numerical parity with nnAudio's multi-rate
decomposition is statistical, not bit-exact (documented divergence).
"""

from __future__ import annotations

import functools
import math
from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from musicfpaugment_tpu.core.stft import frame

Array = jnp.ndarray


@functools.lru_cache(maxsize=None)
def _cqt_kernels(
    sr: int, f_min: float, f_max: float, bins_per_octave: int
) -> Tuple[np.ndarray, np.ndarray, int]:
    """(kernel_len, n_bins) real+imag kernel banks."""
    n_bins = int(math.ceil(bins_per_octave * math.log2(f_max / f_min)))
    q = 1.0 / (2.0 ** (1.0 / bins_per_octave) - 1.0)
    freqs = f_min * 2.0 ** (np.arange(n_bins) / bins_per_octave)
    lengths = np.ceil(q * sr / freqs).astype(int)
    max_len = int(lengths.max())
    t = np.arange(max_len)
    kr = np.zeros((max_len, n_bins), np.float32)
    ki = np.zeros((max_len, n_bins), np.float32)
    for k in range(n_bins):
        n = int(lengths[k])
        start = (max_len - n) // 2  # center kernels in the frame
        win = np.hanning(n)
        phase = 2.0 * np.pi * freqs[k] * (np.arange(n) - n / 2) / sr
        kern = win * np.exp(1j * phase)
        kern = kern / np.abs(kern).sum()
        kr[start : start + n, k] = kern.real
        ki[start : start + n, k] = kern.imag
    return kr, ki, max_len


def cqt_magnitude(
    x: Array,
    sr: int = 8000,
    f_min: float = 32.70,
    f_max: float = 4186.009,
    bins_per_octave: int = 48,
    hop_length: int = 512,
) -> Array:
    """(B, T) -> (B, n_bins, frames) clamped CQT magnitude
    (clamp 1e-7 like ref loss.py:189-201)."""
    kr, ki, max_len = _cqt_kernels(sr, f_min, float(min(f_max, sr / 2 * 0.99)), bins_per_octave)
    pad = max_len // 2
    cfg = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
    xp = jnp.pad(x, cfg, mode="reflect")
    frames = frame(xp, max_len, hop_length)  # (B, frames, max_len)
    real = jnp.einsum("...fl,lk->...fk", frames, jnp.asarray(kr))
    imag = jnp.einsum("...fl,lk->...fk", frames, jnp.asarray(ki))
    mag = jnp.sqrt(real**2 + imag**2)
    return jnp.clip(jnp.swapaxes(mag, -1, -2), min=1e-7)


def cqt_loss(
    x: Array,
    y: Array,
    f_min: float,
    f_max: float,
    bins_per_octave: int,
    hop_length: int,
    sr: int = 8000,
) -> Tuple[Array, Array]:
    """(sc_loss, log-magnitude L1) for one CQT config (ref: loss.py:225-261)."""
    x_mag = cqt_magnitude(x, sr, f_min, f_max, bins_per_octave, hop_length)
    y_mag = cqt_magnitude(y, sr, f_min, f_max, bins_per_octave, hop_length)
    sc = jnp.linalg.norm((y_mag - x_mag).reshape(-1)) / jnp.linalg.norm(
        y_mag.reshape(-1)
    )
    mag = jnp.mean(jnp.abs(jnp.log(y_mag) - jnp.log(x_mag)))
    return sc, mag


def multi_resolution_cqt_loss(
    x: Array,
    y: Array,
    f_min: Sequence[float] = (32.70, 32.70, 32.70),
    f_max: Sequence[float] = (4186.009, 4186.009, 4186.009),
    bins_per_octave: Sequence[int] = (48, 36, 24),
    hop_sizes: Sequence[int] = (512, 128, 64),
    factor_sc: float = 0.1,
    factor_mag: float = 0.1,
    sr: int = 8000,
) -> Tuple[Array, Array]:
    """Mean-over-resolutions CQT losses (ref: loss.py:264-322)."""
    assert len(f_min) == len(f_max) == len(bins_per_octave) == len(hop_sizes)
    sc_loss = 0.0
    mag_loss = 0.0
    for f_mi, f_ma, bpo, hs in zip(f_min, f_max, bins_per_octave, hop_sizes):
        sc, mag = cqt_loss(x, y, f_mi, f_ma, bpo, hs, sr)
        sc_loss += sc
        mag_loss += mag
    n = len(f_min)
    return factor_sc * sc_loss / n, factor_mag * mag_loss / n
