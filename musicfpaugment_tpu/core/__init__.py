"""Core audio/DSP primitives: pure JAX, jit/vmap-safe, static shapes."""

from musicfpaugment_tpu.core.convolve import fft_convolve
from musicfpaugment_tpu.core.filters import (
    bandpass_filter,
    bandstop_filter,
    highpass_filter,
    lowpass_filter,
    lowpass_kernels,
)
from musicfpaugment_tpu.core.noise import batch_colored_noise, gen_colored_noise
from musicfpaugment_tpu.core.resample import downsample2, resample_frac, upsample2
from musicfpaugment_tpu.core.stft import (
    frame,
    magnitude_spectrogram,
    periodic_hann,
    stft,
)
from musicfpaugment_tpu.core.utils import (
    calculate_rms,
    convert_decibels_to_amplitude_ratio,
    convert_frequencies_to_mels,
    convert_mels_to_frequencies,
    next_fast_len,
    peak_normalize,
    rms_normalize,
)

__all__ = [
    "fft_convolve",
    "bandpass_filter",
    "bandstop_filter",
    "highpass_filter",
    "lowpass_filter",
    "lowpass_kernels",
    "batch_colored_noise",
    "gen_colored_noise",
    "downsample2",
    "resample_frac",
    "upsample2",
    "frame",
    "magnitude_spectrogram",
    "periodic_hann",
    "stft",
    "calculate_rms",
    "convert_decibels_to_amplitude_ratio",
    "convert_frequencies_to_mels",
    "convert_mels_to_frequencies",
    "next_fast_len",
    "peak_normalize",
    "rms_normalize",
]
