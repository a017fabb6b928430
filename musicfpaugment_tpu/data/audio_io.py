"""Host-side audio IO (no torchaudio/librosa in this image).

WAV decoding goes through the native C++ decoder when built
(musicfpaugment_tpu.data.native) with a scipy fallback; resampling uses
scipy's polyphase resampler. This is the host boundary — everything after it
is device-resident.

Counterpart of the reference's ``Audio`` loader
(ref: augmentation/utils.py:140-383): offset/num_samples windowing expressed
in *target*-rate samples, mono downmix, resample, off-by-one pad/trim repair.
"""

from __future__ import annotations

import math
import os
from pathlib import Path
from typing import List, Sequence, Tuple, Union

import numpy as np

SUPPORTED_EXTENSIONS = (".wav", ".mp3")


def read_wav(path: Union[str, Path]) -> Tuple[np.ndarray, int]:
    """Return (samples (channels, time) float32 in [-1, 1], sample_rate).

    Dispatches on extension: ``.mp3`` decodes through the native
    libmpg123-backed decoder (the reference uses torchaudio for the mp3
    corpora — MTG-Jamendo/FMA/DCASE; ref: augmentation/utils.py:353),
    everything else through the RIFF/WAVE path.
    """
    if str(path).lower().endswith(".mp3"):
        from musicfpaugment_tpu.data import native

        if not (native.available() and native.mp3_available()):
            raise IOError(
                f"cannot decode {path}: native mp3 decoder unavailable "
                "(libmpg123.so.0 not found — see native/mp3io.cc)"
            )
        return native.read_mp3(str(path))
    try:
        from musicfpaugment_tpu.data import native

        if native.available():
            return native.read_wav(str(path))
    except ImportError:
        pass
    import scipy.io.wavfile

    sr, data = scipy.io.wavfile.read(str(path))
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    if data.ndim == 1:
        data = data[None, :]
    else:
        data = data.T
    return np.ascontiguousarray(data), int(sr)


def wav_metadata(path: Union[str, Path]) -> Tuple[int, int]:
    """Return (num_samples, sample_rate) without decoding the payload
    (ref: augmentation/utils.py:207-220). mp3 paths use a stream scan."""
    if str(path).lower().endswith(".mp3"):
        from musicfpaugment_tpu.data import native

        if not (native.available() and native.mp3_available()):
            raise IOError(f"cannot read {path}: native mp3 decoder unavailable")
        return native.mp3_metadata(str(path))
    try:
        from musicfpaugment_tpu.data import native

        if native.available():
            return native.wav_metadata(str(path))
    except ImportError:
        pass
    import wave

    with wave.open(str(path), "rb") as f:
        return f.getnframes(), f.getframerate()


def resample(samples: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Polyphase resample on the trailing axis."""
    if orig_sr == target_sr:
        return samples
    import scipy.signal

    g = math.gcd(orig_sr, target_sr)
    return scipy.signal.resample_poly(
        samples, target_sr // g, orig_sr // g, axis=-1
    ).astype(np.float32)


def find_audio_files_in_paths(
    paths: Sequence[Union[str, Path]],
    filename_endings: Tuple[str, ...] = SUPPORTED_EXTENSIONS,
    traverse_subdirectories: bool = True,
    follow_symlinks: bool = True,
) -> List[str]:
    """File discovery with the reference's semantics
    (ref: augmentation/utils.py:83-134)."""
    file_paths: List[str] = []
    for p in paths:
        sp = str(p)
        if sp.lower().endswith(filename_endings):
            file_paths.append(os.path.abspath(sp))
        elif os.path.isdir(sp):
            for root, _, filenames in os.walk(sp, followlinks=follow_symlinks):
                for filename in sorted(filenames):
                    if filename.lower().endswith(filename_endings):
                        file_paths.append(
                            os.path.join(os.path.abspath(root), filename)
                        )
                if not traverse_subdirectories:
                    break
    return file_paths


class Audio:
    """Audio IO with on-the-fly resampling (API parity with
    ``augmentation/utils.py:140-383``; numpy instead of torch tensors).

    ``sample_offset`` / ``num_samples`` are expressed at the *target* rate.
    """

    def __init__(self, sample_rate: int, mono: bool = True):
        self.sample_rate = sample_rate
        self.mono = mono

    def get_num_samples(self, file) -> int:
        if isinstance(file, dict):
            if "samples" in file:
                num_samples = np.asarray(file["samples"]).shape[1]
                sr = int(file["sample_rate"])
            else:
                num_samples, sr = wav_metadata(file["audio"])
        else:
            num_samples, sr = wav_metadata(file)
        return math.floor(num_samples * self.sample_rate / sr)

    def rms_normalize(self, samples: np.ndarray) -> np.ndarray:
        rms = np.sqrt(np.mean(np.square(samples), axis=-1, keepdims=True))
        return samples / (rms + 1e-8)

    def downmix_and_resample(self, samples: np.ndarray, sr: int) -> np.ndarray:
        if self.mono and samples.shape[0] > 1:
            samples = samples.mean(axis=0, keepdims=True)
        return resample(samples, sr, self.sample_rate)

    def __call__(
        self,
        file,
        sample_offset: int = 0,
        num_samples: int | None = None,
    ) -> np.ndarray:
        if isinstance(file, dict):
            # {"samples": (channels, time) array, "sample_rate": int}
            # (ref: augmentation/utils.py:312-327)
            if "samples" in file:
                data = np.asarray(file["samples"], np.float32)
                orig_sr = int(file["sample_rate"])
            else:
                data, orig_sr = read_wav(file["audio"])
            channel = file.get("channel")
            if channel is not None:
                data = data[channel - 1 : channel, :]
        else:
            data, orig_sr = read_wav(file)
        orig_off = round(sample_offset * orig_sr / self.sample_rate)
        if num_samples is None:
            orig_n = data.shape[-1] - orig_off
        else:
            orig_n = round(num_samples * orig_sr / self.sample_rate)
        if orig_off + orig_n > data.shape[-1]:
            raise ValueError(
                f"Sample offset {orig_off} -- number of samples {orig_n} -- "
                f"total number of samples {data.shape[-1]}."
            )
        result = self.downmix_and_resample(data[:, orig_off : orig_off + orig_n], orig_sr)
        if num_samples is not None:
            if result.shape[-1] > num_samples:
                result = result[:, :num_samples]
            elif result.shape[-1] < num_samples:
                result = np.pad(
                    result, ((0, 0), (0, num_samples - result.shape[-1]))
                )
        return result
