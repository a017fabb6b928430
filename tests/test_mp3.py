"""mp3 decode through the native libmpg123 path (VERDICT r1 missing #1).

The committed fixture tests/fixtures/tone.mp3 is a 2 s mono 22.05 kHz
440 Hz + 1320 Hz tone encoded with libmp3lame (tests/make_mp3_fixture.py),
so decode correctness is checkable spectrally without golden blobs.
"""

import os

import numpy as np
import pytest

from musicfpaugment_tpu.data import native
from musicfpaugment_tpu.data.audio_io import Audio, read_wav, wav_metadata

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "tone.mp3")

pytestmark = pytest.mark.skipif(
    not (native.available() and native.mp3_available()),
    reason="native mp3 decoder (libmpg123) unavailable",
)


def _dominant_freq(x: np.ndarray, sr: int) -> float:
    spec = np.abs(np.fft.rfft(x * np.hanning(len(x))))
    return float(np.fft.rfftfreq(len(x), 1.0 / sr)[np.argmax(spec)])


def test_read_mp3_shape_and_rate():
    data, sr = read_wav(FIXTURE)
    assert sr == 22050
    assert data.shape[0] == 1
    # 2 s + encoder padding: within half a second of nominal
    assert abs(data.shape[1] - 2 * sr) < sr // 2
    assert data.dtype == np.float32
    peak = np.abs(data).max()
    assert 0.5 < peak < 0.75  # encoded tone peaks at ~0.6 + codec ripple


def test_mp3_spectral_content():
    data, sr = read_wav(FIXTURE)
    seg = data[0, 8000 : 8000 + 16384]
    assert abs(_dominant_freq(seg, sr) - 440.0) < 3.0
    spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    f = np.fft.rfftfreq(len(seg), 1.0 / sr)
    r = spec[np.argmin(np.abs(f - 1320))] / spec[np.argmin(np.abs(f - 440))]
    assert abs(r - 0.5) < 0.1  # amplitudes 0.3 vs 0.6


def test_mp3_metadata_matches_decode():
    frames, sr = wav_metadata(FIXTURE)
    data, sr2 = read_wav(FIXTURE)
    assert sr == sr2
    assert frames == data.shape[1]


def test_audio_loader_mp3_resample_window():
    # Audio() at 8 kHz: offset/num_samples windowing on an mp3 source
    # (ref: augmentation/utils.py:288-383 via torchaudio)
    audio = Audio(sample_rate=8000, mono=True)
    n = audio.get_num_samples(FIXTURE)
    assert abs(n - 2 * 8000) < 8000 // 2
    out = audio(FIXTURE, sample_offset=4000, num_samples=8000)
    assert out.shape == (1, 8000)
    assert abs(_dominant_freq(out[0], 8000) - 440.0) < 4.0


def test_batch_loader_mixed_formats(tmp_path):
    # the native thread-pool batch decoder dispatches per extension
    import scipy.io.wavfile

    sr = 8000
    t = np.arange(sr) / sr
    wav = (0.5 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32)
    wav_path = str(tmp_path / "a.wav")
    scipy.io.wavfile.write(wav_path, sr, (wav * 32767).astype(np.int16))
    results = native.read_wav_batch([wav_path, FIXTURE, str(tmp_path / "nope.mp3")])
    assert results[0] is not None and results[0][1] == sr
    assert results[1] is not None and results[1][1] == 22050
    assert results[2] is None
    assert abs(_dominant_freq(results[1][0][0, :16384], 22050) - 440.0) < 3.0
