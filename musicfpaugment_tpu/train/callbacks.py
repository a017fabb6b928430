"""TensorBoard monitoring callbacks (ref: training/callbacks.py:10-105).

Scalars every epoch; wav + spectrogram triplets (clean/augmented/denoised)
every 10 epochs. Uses tf.summary (TensorFlow is host-side only here).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def monitor_losses(writer, losses: Dict[str, float], datas: str, epoch: int) -> None:
    import tensorflow as tf

    with writer.as_default():
        for key, value in losses.items():
            tf.summary.scalar(f"{datas}/{key}", float(value), step=epoch)


def monitor_metrics(writer, metrics: Dict[str, float], datas: str, epoch: int) -> None:
    import tensorflow as tf

    with writer.as_default():
        for key, value in metrics.items():
            tf.summary.scalar(f"{datas}/metric_{key}", float(value), step=epoch)


def monitor_audios(
    writer, clean, augmented, denoised, epoch: int, datas: str,
    sample_rate: int = 8000, max_outputs: int = 3,
) -> None:
    """Log audio triplets (ref: callbacks.py audio dumps every 10 epochs)."""
    import tensorflow as tf

    with writer.as_default():
        for name, batch in [
            ("clean", clean), ("augmented", augmented), ("denoised", denoised),
        ]:
            audio = np.asarray(batch)[:max_outputs]
            tf.summary.audio(
                f"{datas}/{name}",
                audio[..., None].astype(np.float32),
                sample_rate,
                step=epoch,
                max_outputs=max_outputs,
            )


def monitor_specs(
    writer, clean, augmented, denoised, epoch: int, datas: str, max_outputs: int = 3
) -> None:
    """Log spectrogram images of waveform triplets."""
    from musicfpaugment_tpu.train.trainer import spectrogram_batch

    specs = [
        np.asarray(spectrogram_batch(np.asarray(batch)[:max_outputs]))
        for batch in (clean, augmented, denoised)
    ]
    monitor_specs_precomputed(writer, *specs, epoch=epoch, datas=datas,
                              max_outputs=max_outputs)


def monitor_specs_precomputed(
    writer, clean_spec, augmented_spec, denoised_spec, epoch: int, datas: str,
    max_outputs: int = 3,
) -> None:
    """Log spectrogram-image triplets that are already in the spectrogram
    domain (the UNet path: the denoiser output IS a spectrogram)."""
    import tensorflow as tf

    with writer.as_default():
        for name, spec in [
            ("clean", clean_spec),
            ("augmented", augmented_spec),
            ("denoised", denoised_spec),
        ]:
            spec = np.asarray(spec)[:max_outputs]
            img = spec[..., None] / max(spec.max(), 1e-9)
            tf.summary.image(
                f"{datas}/spec_{name}", img[:, ::-1, :, :], step=epoch,
                max_outputs=max_outputs,
            )
