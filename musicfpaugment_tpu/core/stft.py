"""Batched STFT matching the reference's two (identical) frontends.

The reference computes the exact same transform in two places and relies on
them agreeing (training/visualisation.py:14-17 docstring):

* numpy path for audfprint (afp/audfprint/stft.py:15-62): reflect-pad by
  ``n_fft // 2``, stride-trick framing, *periodic* Hann
  (``np.hanning(n_fft + 2)[1:-1]``), rfft, returned as (freq, frames).
* torch path for training (training/visualisation.py:13-36): ``torch.stft``
  with the same window, ``center=True`` reflect padding, n_fft 512, hop 256.

Here there is a single batched, jit/vmap-safe implementation.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


@functools.lru_cache(maxsize=None)
def periodic_hann(window_length: int) -> np.ndarray:
    """Periodic Hann window, ``np.hanning(n + 2)[1:-1]`` semantics
    (ref: afp/audfprint/stft.py:41, training/visualisation.py:18)."""
    return np.hanning(window_length + 2)[1:-1].astype(np.float32)


def frame(signal: Array, frame_length: int, hop_length: int) -> Array:
    """Slice ``signal[..., t]`` into overlapping frames.

    Returns shape ``(..., num_frames, frame_length)`` with
    ``num_frames = 1 + (T - frame_length) // hop_length``. Gather-based
    (static shapes) instead of the reference's numpy stride tricks
    (ref: afp/audfprint/stft.py:52-58).
    """
    num_samples = signal.shape[-1]
    num_frames = 1 + (num_samples - frame_length) // hop_length
    idx = (
        np.arange(num_frames)[:, None] * hop_length + np.arange(frame_length)[None, :]
    )
    return signal[..., idx]


def stft(
    signal: Array,
    n_fft: int = 512,
    hop_length: int | None = None,
    window: Array | None = None,
    center: bool = True,
) -> Array:
    """Short-time Fourier transform.

    Returns complex spectrogram of shape ``(..., n_fft // 2 + 1, num_frames)``
    — frequency-major like both reference frontends.
    """
    if window is None:
        window = jnp.asarray(periodic_hann(n_fft))
    window_length = window.shape[-1]
    if hop_length is None:
        hop_length = window_length // 2
    if center:
        pad = [(0, 0)] * (signal.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        signal = jnp.pad(signal, pad, mode="reflect")
    frames = frame(signal, window_length, hop_length)
    spec = jnp.fft.rfft(frames * window, n=n_fft, axis=-1)
    return jnp.swapaxes(spec, -1, -2)


def magnitude_spectrogram(
    waveform: Array,
    n_fft: int = 512,
    hop_length: int = 256,
    per_example: bool = False,
    eps: float = 0.0,
) -> Array:
    """|STFT| divided by its max — the shared model/AFP frontend.

    Matches ``training/visualisation.py:13-36`` (global max over the whole
    tensor, deliberately identical to audfprint's normalization at
    afp/audfprint/peak_extractor.py:259-263). Set ``per_example=True`` for a
    per-batch-element max instead (divergence documented; useful for batched
    serving where examples must not couple).
    """
    mag = jnp.abs(stft(waveform, n_fft=n_fft, hop_length=hop_length))
    if per_example:
        axes = tuple(range(mag.ndim - 2, mag.ndim))
        denom = jnp.max(mag, axis=axes, keepdims=True)
    else:
        denom = jnp.max(mag)
    return mag / jnp.maximum(denom, eps if eps > 0 else jnp.finfo(mag.dtype).tiny)
