"""Windowed-sinc FIR filters with per-example cutoffs — batched, static-shape.

The reference applies julius' ``lowpass_filter`` per example in a Python loop
(ref: augmentation/transformations/pass_filters.py:98-110, with an explicit
TODO to batch). julius builds, per call, a symmetric windowed-sinc kernel of
*cutoff-dependent* length ``half_size = int(zeros / cutoff / 2)`` (zeros=8),
normalized to unit sum, applied with replicate padding.

TPU-native design: the kernel is constructed *analytically inside jit* at a
fixed maximum length ``2 * half_size_max + 1`` — taps beyond the per-example
``half_size`` are masked to zero, so the numerical result equals julius'
variable-length kernel exactly (a zero tap contributes nothing), while every
shape stays static. The convolution runs as one batched FFT convolution over
the whole batch (no Python loop), and replicate padding by ``half_size_max``
reproduces julius' edge behavior because only the innermost ``half_size``
padded samples are touched by non-zero taps.

Divergence (documented): cutoff fractions below ``zeros / (2 * half_size_max)``
(default: ~3.9 Hz at 8 kHz with half_size_max=4096) get a truncated kernel.
The default AugmentFP ranges (>=30 Hz for the active mass of the mel-uniform
cutoff distributions, constants.py:11-21) are fully covered.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from musicfpaugment_tpu.core.convolve import fft_convolve

Array = jnp.ndarray

DEFAULT_ZEROS = 8.0
DEFAULT_HALF_SIZE_MAX = 4096

# Kernels at or below this tap count run as a direct grouped convolution
# instead of FFT overlap-save: measured on v5e, a 129-tap direct conv over
# (256, 64000) is ~5x faster than the FFT path (and exact — precision=HIGHEST
# keeps f32 accumulation, max rel. error vs the FFT path ~7e-7).
DIRECT_CONV_MAX_TAPS = 513


def lowpass_kernels(
    cutoffs: Array,
    half_size_max: int = DEFAULT_HALF_SIZE_MAX,
    zeros: float = DEFAULT_ZEROS,
) -> Array:
    """Build julius-compatible low-pass kernels for a vector of cutoffs.

    Args:
        cutoffs: (B,) cutoff frequencies as a *fraction of the sample rate*
            (so 0.5 is Nyquist), traced values allowed.
        half_size_max: static maximum half kernel length.
        zeros: number of sinc zero crossings kept (julius default 8).

    Returns:
        (B, 2 * half_size_max + 1) kernels, unit sum, symmetric; rows for
        cutoff <= 0 are all-zero (julius maps cutoff 0 to a zero filter).
    """
    cutoffs = jnp.atleast_1d(cutoffs).astype(jnp.float32)[:, None]
    t = jnp.arange(-half_size_max, half_size_max + 1, dtype=jnp.float32)[None, :]
    positive = cutoffs > 0.0
    safe_c = jnp.where(positive, cutoffs, 1.0)
    # julius: half_size = int(zeros / cutoff / 2)
    half = jnp.floor(zeros / safe_c / 2.0)
    half = jnp.clip(half, 1.0, float(half_size_max))
    inside = jnp.abs(t) <= half
    # torch.hann_window(2h+1, periodic=False) re-centered: w(t) = (1+cos(pi t/h))/2
    window = 0.5 * (1.0 + jnp.cos(jnp.pi * t / half))
    arg = 2.0 * safe_c * t * jnp.pi
    sinc = jnp.where(t == 0.0, 1.0, jnp.sin(arg) / jnp.where(arg == 0.0, 1.0, arg))
    kernel = jnp.where(inside, 2.0 * safe_c * window * sinc, 0.0)
    kernel = kernel / jnp.sum(kernel, axis=-1, keepdims=True)
    return jnp.where(positive, kernel, 0.0)


def _edge_pad(samples: Array, pad: int) -> Array:
    cfg = [(0, 0)] * (samples.ndim - 1) + [(pad, pad)]
    return jnp.pad(samples, cfg, mode="edge")


def _direct_conv_valid(padded: Array, kernels: Array) -> Array:
    """'valid' convolution with a per-example kernel as one grouped
    ``conv_general_dilated`` (feature_group_count = batch) — the fast path
    for short kernels, where FFT overlap-save wastes bandwidth on spectra.

    padded: (B, Tp) or (B, C, Tp); kernels: (B, n). Returns (..., Tp - n + 1).
    """
    n = kernels.shape[-1]
    if padded.ndim == 2:
        x = padded[None]  # (1, B, Tp)
        k = kernels[:, None, ::-1]  # (B, 1, n) — flip: conv, not correlation
        groups = padded.shape[0]
    else:
        b, c, tp = padded.shape
        x = padded.reshape(1, b * c, tp)
        k = jnp.repeat(kernels[:, None, ::-1], c, axis=0)  # (B*C, 1, n)
        groups = b * c
    y = jax.lax.conv_general_dilated(
        x,
        k,
        window_strides=(1,),
        padding=[(0, 0)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups,
        precision=jax.lax.Precision.HIGHEST,
    )
    return y[0] if padded.ndim == 2 else y.reshape(padded.shape[:-1] + (-1,))


def lowpass_filter(
    samples: Array,
    cutoffs: Array,
    half_size_max: int = DEFAULT_HALF_SIZE_MAX,
    zeros: float = DEFAULT_ZEROS,
) -> Array:
    """Batched low-pass: ``samples`` (B, T) or (B, C, T), ``cutoffs`` (B,)
    fractions of sr.

    Matches ``julius.lowpass_filter(x, cutoff, fft=False)`` applied per
    example (ref: pass_filters.py:98-110) — one fused FFT conv instead of the
    reference's per-example loop.
    """
    kernels = lowpass_kernels(cutoffs, half_size_max, zeros)  # (B, 2H+1)
    padded = _edge_pad(samples, half_size_max)  # (..., T + 2H)
    if kernels.shape[-1] <= DIRECT_CONV_MAX_TAPS:
        return _direct_conv_valid(padded, kernels)
    kernels = kernels.reshape(
        kernels.shape[0], *([1] * (samples.ndim - 2)), kernels.shape[-1]
    )
    return fft_convolve(padded, kernels, mode="valid")  # same shape as input


def highpass_filter(
    samples: Array,
    cutoffs: Array,
    half_size_max: int = DEFAULT_HALF_SIZE_MAX,
    zeros: float = DEFAULT_ZEROS,
) -> Array:
    """High-pass as identity minus low-pass (ref: pass_filters.py:144-155)."""
    return samples - lowpass_filter(samples, cutoffs, half_size_max, zeros)


def bandpass_filter(
    samples: Array,
    low_cutoffs: Array,
    high_cutoffs: Array,
    half_size_max: int = DEFAULT_HALF_SIZE_MAX,
    zeros: float = DEFAULT_ZEROS,
) -> Array:
    """Band-pass = lowpass(high) - lowpass(low), julius' own construction
    (ref: augmentation/transformations/band_filters.py:131-155)."""
    return lowpass_filter(samples, high_cutoffs, half_size_max, zeros) - lowpass_filter(
        samples, low_cutoffs, half_size_max, zeros
    )


def bandstop_filter(
    samples: Array,
    low_cutoffs: Array,
    high_cutoffs: Array,
    half_size_max: int = DEFAULT_HALF_SIZE_MAX,
    zeros: float = DEFAULT_ZEROS,
) -> Array:
    """Band-stop = identity - band-pass (ref: band_filters.py:195-207)."""
    return samples - bandpass_filter(
        samples, low_cutoffs, high_cutoffs, half_size_max, zeros
    )
