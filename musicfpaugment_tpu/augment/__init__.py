"""AugmentFP engine: jit-compiled, batched music degradation on TPU."""

from musicfpaugment_tpu.augment.banks import (
    IRBank,
    NoiseBank,
    build_ir_bank,
    build_noise_bank,
)
from musicfpaugment_tpu.augment.compose import BaseCompose, Compose, OneOf, SomeOf
from musicfpaugment_tpu.augment.constants import (
    DEFAULT_PARAMETERS,
    IMPULSE_RESPONSE_DIR,
    WAVEFORM_SAMPLING_RATE,
)
from musicfpaugment_tpu.augment.pipeline import AugmentFP, dcase_shaped_banks, synthetic_banks
from musicfpaugment_tpu.augment.transforms import (
    AddBackgroundNoise,
    AddColoredNoise,
    ApplyImpulseResponse,
    BandPassFilter,
    BandStopFilter,
    BaseWaveformTransform,
    Clipping,
    Gain,
    HighPassFilter,
    LowPassFilter,
    PeakNormalization,
)

__all__ = [
    "AugmentFP",
    "synthetic_banks",
    "dcase_shaped_banks",
    "IRBank",
    "NoiseBank",
    "build_ir_bank",
    "build_noise_bank",
    "BaseCompose",
    "Compose",
    "OneOf",
    "SomeOf",
    "DEFAULT_PARAMETERS",
    "IMPULSE_RESPONSE_DIR",
    "WAVEFORM_SAMPLING_RATE",
    "AddBackgroundNoise",
    "AddColoredNoise",
    "ApplyImpulseResponse",
    "BandPassFilter",
    "BandStopFilter",
    "BaseWaveformTransform",
    "Clipping",
    "Gain",
    "HighPassFilter",
    "LowPassFilter",
    "PeakNormalization",
]
