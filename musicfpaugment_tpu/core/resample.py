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


def _up2_np(x: np.ndarray, zeros: int = 56) -> np.ndarray:
    """Pure-numpy mirror of :func:`upsample2` on a 1-D signal (used only to
    extract the composed x4 phase basis below — keeps the extraction off
    any accelerator backend)."""
    k = _kernel_updown2(zeros)
    odd = np.correlate(np.pad(x, zeros), k, mode="valid")[1:]
    y = np.empty(2 * x.size, np.float32)
    y[0::2] = x
    y[1::2] = odd
    return y


@functools.lru_cache(maxsize=None)
def up4_phase_basis(zeros: int = 56):
    """Phase basis of the x4 sinc upsampler as rate-1 FIRs.

    Returns ``(C, D)`` with ``C`` of shape (8, 2*D+1) float32 such that for
    ``z = upsample2(upsample2(x))`` (zero-padding boundary semantics — an
    exact linear convolution, valid at edges too):

        z[4*m + k] == sum_d C[k, D + d] * x[m - d]        for k in [0, 8).

    The 8 rows cover the two x-grid offsets of each of the 4 phases that a
    kernel_size-8 / stride-4 conv window touches, so a Demucs first encoder
    conv over ``z`` collapses to ONE stride-1 conv over ``x`` with the
    learned-weight combination of these rows (models/demucs.py
    fused_frontend). Extracted numerically from an impulse response of the
    actual upsampler composition; exact because the upsampler commutes with
    rate-1 shifts (per-phase shift invariance).
    """
    n = 16 * zeros + 9
    p0 = n // 2
    imp = np.zeros(n, np.float32)
    imp[p0] = 1.0
    z = _up2_np(_up2_np(imp, zeros), zeros)  # (4n,)
    # composed support at rate 1: stage-1 odd filter spans +-zeros input
    # samples, stage-2's spans +-zeros rate-2 samples = +-zeros/2 more
    d_max = zeros + zeros // 2 + 4
    d = np.arange(-d_max, d_max + 1)
    rows = []
    for k in range(8):
        idx = 4 * (p0 + d) + k
        rows.append(z[idx])
    c = np.stack(rows).astype(np.float32)  # (8, 2*d_max+1)
    # trim exact-zero flanks (keep symmetric width); the flanks must
    # actually be zero or d_max was too small
    nz = np.nonzero(np.abs(c).sum(axis=0))[0]
    lo, hi = int(nz[0]), int(nz[-1])
    assert lo > 0 and hi < c.shape[1] - 1, "up4 phase support exceeds bound"
    w = max(d_max - lo, hi - d_max)
    c = c[:, d_max - w : d_max + w + 1]
    return c, w


def _down2_np(x: np.ndarray, zeros: int = 56) -> np.ndarray:
    """Pure-numpy mirror of :func:`downsample2` on a 1-D signal."""
    if x.size % 2 != 0:
        x = np.pad(x, (0, 1))
    xeven, xodd = x[0::2], x[1::2]
    k = _kernel_updown2(zeros)
    out = np.correlate(np.pad(xodd, zeros), k, mode="valid")[:-1]
    return ((xeven + out) * 0.5).astype(np.float32)


@functools.lru_cache(maxsize=None)
def down4_phase_basis(zeros: int = 56):
    """Phase basis of the x4 sinc downsampler as rate-1 FIRs.

    Returns ``(S, D)`` with ``S`` of shape (8, 2*D+1) float32 such that for
    ``out = downsample2(downsample2(z))`` with ``len(z) % 4 == 0``:

        out[n] == sum_{m,k} z[4*m + k] * S[k, D + (n - m)]

    i.e. each of the 8 interleaved phase/offset streams of ``z`` reaches
    the output through a fixed FIR. A Demucs last decoder ConvTranspose
    (kernel 8 / stride 4) followed by this downsampler collapses to ONE
    stride-1 conv at the original rate (models/demucs.py fused_frontend).
    Same extraction idea as :func:`up4_phase_basis`; exact in the interior
    (the finite pipeline truncates the x2 intermediate at the edges).
    """
    d_max = zeros + zeros // 2 + 4
    n = 8 * d_max + 16
    p0 = n // 2
    rows = []
    for k in range(8):
        imp = np.zeros(4 * n, np.float32)
        imp[4 * p0 + k] = 1.0
        out = _down2_np(_down2_np(imp, zeros), zeros)  # (n,)
        e = np.arange(-d_max, d_max + 1)
        rows.append(out[p0 + e])
    s = np.stack(rows).astype(np.float32)
    nz = np.nonzero(np.abs(s).sum(axis=0))[0]
    lo, hi = int(nz[0]), int(nz[-1])
    assert lo > 0 and hi < s.shape[1] - 1, "down4 phase support exceeds bound"
    w = max(d_max - lo, hi - d_max)
    s = s[:, d_max - w : d_max + w + 1]
    return s, w


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
