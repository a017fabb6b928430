"""Data layer tests: native wav decoder, audio IO, segment pipeline."""

import os

import numpy as np
import pytest
import scipy.io.wavfile

from musicfpaugment_tpu.data import native
from musicfpaugment_tpu.data.audio_io import Audio, read_wav, wav_metadata
from musicfpaugment_tpu.data.dataset import (
    SegmentPipeline,
    load_track,
    segment_track,
    select_no_silence_frames,
)

SR = 8000


def _write(tmp_path, name, data, sr=SR):
    p = str(tmp_path / name)
    scipy.io.wavfile.write(p, sr, data)
    return p


# ------------------------------------------------------------ native

def test_native_builds_and_decodes_int16(tmp_path, rng):
    if not native.available():
        pytest.skip("no C++ toolchain available")
    x = (rng.standard_normal(5000) * 10000).astype(np.int16)
    p = _write(tmp_path, "a.wav", x)
    data, sr = native.read_wav(p)
    assert sr == SR and data.shape == (1, 5000)
    np.testing.assert_allclose(data[0], x / 32768.0, atol=1e-6)
    frames, sr2 = native.wav_metadata(p)
    assert frames == 5000 and sr2 == SR


def test_native_decodes_float32_stereo(tmp_path, rng):
    if not native.available():
        pytest.skip("no C++ toolchain available")
    x = rng.standard_normal((3000, 2)).astype(np.float32) * 0.5
    p = _write(tmp_path, "b.wav", x)
    data, sr = native.read_wav(p)
    assert data.shape == (2, 3000)
    np.testing.assert_allclose(data.T, x, atol=1e-6)


def test_native_batch_decode(tmp_path, rng):
    if not native.available():
        pytest.skip("no C++ toolchain available")
    paths = []
    for i in range(8):
        x = (rng.standard_normal(1000 + i) * 10000).astype(np.int16)
        paths.append(_write(tmp_path, f"c{i}.wav", x))
    paths.append(str(tmp_path / "missing.wav"))
    results = native.read_wav_batch(paths)
    assert results[-1] is None
    for i, r in enumerate(results[:-1]):
        assert r is not None
        data, sr = r
        assert data.shape == (1, 1000 + i)


# ------------------------------------------------------------ audio_io

def test_read_wav_fallback_matches_native(tmp_path, rng):
    x = (rng.standard_normal(2000) * 20000).astype(np.int16)
    p = _write(tmp_path, "d.wav", x)
    data, sr = read_wav(p)
    assert sr == SR
    np.testing.assert_allclose(data[0], x / 32768.0, atol=1e-5)
    frames, sr2 = wav_metadata(p)
    assert frames == 2000 and sr2 == SR


def test_audio_loader_offset_and_padding(tmp_path, rng):
    x = (np.arange(4000) % 100).astype(np.int16) * 100
    p = _write(tmp_path, "e.wav", x)
    audio = Audio(sample_rate=SR)
    out = audio(p, sample_offset=100, num_samples=500)
    assert out.shape == (1, 500)
    np.testing.assert_allclose(out[0], x[100:600] / 32768.0, atol=1e-5)
    assert audio.get_num_samples(p) == 4000


def test_audio_loader_resamples(tmp_path):
    t = np.arange(16000) / 16000
    x = (np.sin(2 * np.pi * 440 * t) * 20000).astype(np.int16)
    p = _write(tmp_path, "f.wav", x, sr=16000)
    audio = Audio(sample_rate=SR)
    out = audio(p)
    assert abs(out.shape[-1] - SR) <= 1
    spec = np.abs(np.fft.rfft(out[0]))
    assert abs(np.argmax(spec) - 440 * out.shape[-1] // SR) <= 2


# ------------------------------------------------------------ pipeline

def test_segment_and_silence_filter(rng):
    audio = rng.standard_normal(10 * SR).astype(np.float32)
    audio[: 5 * SR] *= 0.0001  # first half silent
    segs = segment_track(audio, 1.0, SR)
    assert segs.shape == (10, SR)
    kept = select_no_silence_frames(audio, segs)
    assert 4 <= kept.shape[0] <= 6  # silent half dropped


def test_segment_pipeline_yields_batches(tmp_path, rng):
    paths = []
    for i in range(4):
        x = (rng.standard_normal(6 * SR) * 10000).astype(np.int16)
        paths.append(_write(tmp_path, f"t{i}.wav", x))
    pipe = SegmentPipeline(
        paths, SR, duration_s=1.0, n_segments=4, batch_size=8,
        buffer_size=16, num_workers=2,
    )
    it = iter(pipe)
    b1 = next(it)
    b2 = next(it)
    pipe.stop()
    assert b1.shape == (8, SR) and b2.shape == (8, SR)
    assert np.isfinite(b1).all()
    assert not np.array_equal(b1, b2)


def test_load_track_corrupt_gives_silence(tmp_path):
    p = str(tmp_path / "corrupt.wav")
    with open(p, "wb") as f:
        f.write(b"not a wav file at all")
    out = load_track(p, SR)
    assert np.all(out == 0)


def test_audio_loader_dict_input(rng):
    """Audio() accepts {"samples", "sample_rate"} dicts
    (ref: augmentation/utils.py:312-327)."""
    audio = Audio(sample_rate=SR)
    samples = rng.standard_normal((1, 16000)).astype(np.float32)
    out = audio({"samples": samples, "sample_rate": 16000})
    assert abs(out.shape[-1] - 8000) <= 1
    out2 = audio(
        {"samples": samples, "sample_rate": SR}, sample_offset=10, num_samples=100
    )
    np.testing.assert_allclose(out2[0], samples[0, 10:110], atol=1e-6)


def test_synth_tracks_device_properties():
    """Device corpus generator: track i is a pure function of
    fold_in(key, i) — batch-size invariant, deterministic, peak-normalized,
    onset-rich (it must yield enough landmark peaks to index)."""
    import jax
    import jax.numpy as jnp

    from musicfpaugment_tpu.data.synthetic import synth_tracks_device

    key = jax.random.PRNGKey(7)
    T = 4 * 8000
    a = np.asarray(synth_tracks_device(key, jnp.arange(6), T, 8000))
    b = np.asarray(synth_tracks_device(key, jnp.arange(2, 5), T, 8000))
    assert a.shape == (6, T)
    np.testing.assert_array_equal(a[2:5], b)  # batch-size invariance
    c = np.asarray(synth_tracks_device(key, jnp.arange(6), T, 8000))
    np.testing.assert_array_equal(a, c)  # determinism
    peaks = np.abs(a).max(axis=1)
    np.testing.assert_allclose(peaks, 1.0, atol=1e-5)  # normalized
    # distinct tracks
    assert np.abs(a[0] - a[1]).max() > 0.1
    # onset-rich: a healthy fraction of nonzero samples
    assert (np.abs(a) > 1e-4).mean() > 0.3
