"""Spectrogram frontend + plotting (ref: training/visualisation.py:13-63)."""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
import numpy as np

from musicfpaugment_tpu.train.trainer import spectrogram_batch


def spectrogram(waveform, amplitude: bool = False) -> Any:
    """The model-frontend STFT — same parameters as audfprint's STFT
    (ref: visualisation.py:13-36). Accepts (T,), (B, T)."""
    x = jnp.asarray(waveform, jnp.float32)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None]
    spec = spectrogram_batch(x)
    if squeeze:
        spec = spec[0]
    if amplitude:
        mag = np.asarray(spec)
        ref = mag.max()
        return 20.0 * np.log10(np.maximum(mag, 1e-10) / max(ref, 1e-10))
    return spec


def plot_spectrogram(
    spec, save_path: Optional[str] = None, amplitude: bool = False,
    sample_rate: int = 8000, hop_length: int = 256,
) -> Any:
    """Matplotlib spectrogram figure (ref: visualisation.py:39-63).
    Gated on matplotlib availability."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    spec = np.asarray(spec)
    if amplitude:
        ref = spec.max()
        spec = 20.0 * np.log10(np.maximum(spec, 1e-10) / max(ref, 1e-10))
    fig, ax = plt.subplots(figsize=(10, 8))
    extent = [0, spec.shape[-1] * hop_length / sample_rate, 0, sample_rate / 2]
    im = ax.imshow(
        spec, origin="lower", aspect="auto", extent=extent, cmap="magma"
    )
    ax.set_title("STFT spectrum")
    ax.set_xlabel("Time")
    ax.set_ylabel("Hz")
    plt.colorbar(im, ax=ax, format="%+2.0f dB")
    if save_path is not None:
        plt.savefig(save_path, dpi=300)
    return fig
