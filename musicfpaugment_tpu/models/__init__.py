"""Denoiser model family: UNet (spectrogram) and Demucs (waveform)."""

from musicfpaugment_tpu.models.demucs import BLSTM, Demucs, rescale_params
from musicfpaugment_tpu.models.streamer import DemucsStreamer
from musicfpaugment_tpu.models.unet import DoubleConv, Down, UNet, Up

__all__ = [
    "UNet", "DoubleConv", "Down", "Up", "Demucs", "BLSTM", "rescale_params",
    "DemucsStreamer",
]
