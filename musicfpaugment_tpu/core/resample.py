"""Sinc resampling (pure JAX).

* ``upsample2`` / ``downsample2``: the x2 sinc interpolation pair used inside
  Demucs (ref: training/model.py:22-88) — 56-zero windowed sinc, exact
  padding/trim semantics of the reference.
* ``resample_frac``: julius-style polyphase windowed-sinc rational resampler,
  the device-side counterpart of ``torchaudio.transforms.Resample`` used when
  loading queries (ref: afp/audfprint/peak_extractor.py:378-381; in the
  shipped eval configs the ratio is 1:1, so it's an identity there).
"""

from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np

from musicfpaugment_tpu.core.convolve import toeplitz_conv1d

Array = jnp.ndarray


def _sinc(t: np.ndarray) -> np.ndarray:
    return np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t))


@functools.lru_cache(maxsize=None)
def _kernel_updown2(zeros: int = 56) -> np.ndarray:
    """Shared half-sample sinc kernel for the x2 pair
    (ref: training/model.py:28-37, :57-66)."""
    win = np.hanning(4 * zeros + 1)  # symmetric Hann, torch periodic=False
    winodd = win[1::2]
    t = np.linspace(-zeros + 0.5, zeros - 0.5, 2 * zeros) * math.pi
    return (_sinc(t) * winodd).astype(np.float32)


def _conv1d_same_padded(x: Array, kernel: np.ndarray, padding: int) -> Array:
    """F.conv1d(x, kernel, padding=padding) on the trailing axis.

    Kernel is 1-D (correlation == convolution here only if symmetric, so we
    flip explicitly to get true torch conv1d cross-correlation semantics).
    """
    cfg = [(0, 0)] * (x.ndim - 1) + [(padding, padding)]
    xp = jnp.pad(x, cfg)
    # short static sinc kernel -> blocked Toeplitz matmul on the MXU
    # (convolve.toeplitz_conv1d), ~3x the overlap-save FFT formulation at
    # Demucs frontend shapes; kernel pre-flipped for torch conv1d
    # cross-correlation semantics
    return toeplitz_conv1d(xp, kernel[::-1].copy(), mode="valid")


def upsample2(x: Array, zeros: int = 56) -> Array:
    """Upsample trailing axis by 2 via sinc interpolation
    (ref: training/model.py:40-54)."""
    kernel = _kernel_updown2(zeros)
    out = _conv1d_same_padded(x, kernel, zeros)[..., 1:]
    y = jnp.stack([x, out], axis=-1)
    return y.reshape(*x.shape[:-1], -1)


def downsample2(x: Array, zeros: int = 56) -> Array:
    """Downsample trailing axis by 2 (ref: training/model.py:69-88)."""
    if x.shape[-1] % 2 != 0:
        cfg = [(0, 0)] * (x.ndim - 1) + [(0, 1)]
        x = jnp.pad(x, cfg)
    xeven = x[..., ::2]
    xodd = x[..., 1::2]
    kernel = _kernel_updown2(zeros)
    out = xeven + _conv1d_same_padded(xodd, kernel, zeros)[..., :-1]
    return out * 0.5


def resample_frac(
    x: Array, old_sr: int, new_sr: int, zeros: int = 24, rolloff: float = 0.945
) -> Array:
    """Rational windowed-sinc resampler on the trailing axis.

    Polyphase formulation: for each of ``new_sr // gcd`` output phases a
    fixed sinc kernel is correlated with the input at stride
    ``old_sr // gcd``. Matches julius/torchaudio `sinc_interp_hann` style
    resampling (statistical parity with the reference's torchaudio Resample;
    bit-exactness with torch is out of scope, SURVEY.md §7 hard-part 5).
    """
    g = math.gcd(old_sr, new_sr)
    old, new = old_sr // g, new_sr // g
    if old == new:
        return x
    T = x.shape[-1]
    # anti-aliasing cutoff as a fraction of the *input* sample rate
    sr_cut = rolloff * min(1.0, new / old) * 0.5 / old
    width = math.ceil(zeros / (2 * sr_cut))
    idx = np.arange(-width, width + old, dtype=np.float64)
    kernels = []
    for phase in range(new):
        t = (idx - phase * old / new) * 2 * math.pi * sr_cut
        t_lim = zeros * math.pi
        window = np.cos(np.clip(t / zeros / 2, -math.pi / 2, math.pi / 2)) ** 2
        kern = np.where(np.abs(t) <= t_lim, _sinc(t) * window, 0.0)
        kernels.append(2 * sr_cut * kern)
    kernels_np = np.stack(kernels).astype(np.float32)  # (new, K)
    K = kernels_np.shape[-1]
    cfg = [(0, 0)] * (x.ndim - 1) + [(width, width + old)]
    xp = jnp.pad(x, cfg)
    n_blocks = T // old + 1
    starts = np.arange(n_blocks) * old
    gather = starts[:, None] + np.arange(K)[None, :]
    frames = xp[..., gather]  # (..., n_blocks, K)
    out = jnp.einsum("...bk,pk->...bp", frames, jnp.asarray(kernels_np))
    out = out.reshape(*x.shape[:-1], n_blocks * new)
    new_len = int(math.ceil(T * new / old))
    return out[..., :new_len]
