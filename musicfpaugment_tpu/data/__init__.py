"""Host-side data layer: audio IO, dataset metadata parsing, input pipeline."""

from musicfpaugment_tpu.data.audio_io import (
    Audio,
    find_audio_files_in_paths,
    read_wav,
    resample,
    wav_metadata,
)

__all__ = [
    "Audio",
    "find_audio_files_in_paths",
    "read_wav",
    "resample",
    "wav_metadata",
]
