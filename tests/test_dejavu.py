"""Dejavu layer tests: reduce_window peak detector vs the scipy oracle,
specgram PSD semantics, SQL store, end-to-end recognition on a toy corpus."""

import numpy as np
import pytest

import jax.numpy as jnp

from musicfpaugment_tpu.afp.dejavu import (
    Dejavu,
    FileRecognizer,
    SQLiteDatabase,
    detect_peaks_mask,
    fingerprint,
    generate_hashes,
)
from musicfpaugment_tpu.afp.dejavu.fingerprint import specgram_psd


# ------------------------------------------------------------ peak detector

def _scipy_peaks(arr2d, amp_min=50, neighborhood=10):
    """Oracle: the reference's scipy construction (fingerprint.py:94-152)."""
    from scipy.ndimage import (
        binary_erosion,
        generate_binary_structure,
        iterate_structure,
        maximum_filter,
    )

    struct = generate_binary_structure(2, 2)
    footprint = iterate_structure(struct, neighborhood)
    local_max = maximum_filter(arr2d, footprint=footprint) == arr2d
    background = arr2d == 0
    eroded = binary_erosion(background, structure=footprint, border_value=1)
    detected = local_max != eroded
    return detected & (arr2d > amp_min)


def test_detect_peaks_matches_scipy(rng):
    arr = (rng.standard_normal((257, 120)) * 30).astype(np.float32)
    got = np.asarray(detect_peaks_mask(jnp.asarray(arr), amp_min=50))
    want = _scipy_peaks(arr, amp_min=50)
    np.testing.assert_array_equal(got, want)


def test_detect_peaks_with_zero_background(rng):
    arr = np.zeros((100, 80), np.float32)
    arr[10:50, 20:60] = (rng.standard_normal((40, 40)) * 60).astype(np.float32)
    got = np.asarray(detect_peaks_mask(jnp.asarray(arr), amp_min=50))
    want = _scipy_peaks(arr, amp_min=50)
    np.testing.assert_array_equal(got, want)


def test_detect_peaks_batched(rng):
    arrs = (rng.standard_normal((3, 64, 50)) * 40).astype(np.float32)
    got = np.asarray(detect_peaks_mask(jnp.asarray(arrs), amp_min=30))
    for i in range(3):
        want = _scipy_peaks(arrs[i], amp_min=30)
        np.testing.assert_array_equal(got[i], want)


def test_specgram_psd_matches_mlab(rng):
    """PSD semantics vs matplotlib.mlab.specgram."""
    mlab = pytest.importorskip("matplotlib.mlab")
    x = rng.standard_normal(8000).astype(np.float32) * 100
    want = mlab.specgram(
        x, NFFT=512, Fs=8000, window=mlab.window_hanning, noverlap=256
    )[0]
    got = np.asarray(specgram_psd(jnp.asarray(x), fs=8000))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=1e-9)


# ------------------------------------------------------------ hashes

def test_generate_hashes_reference_properties():
    peaks = [(10, 0), (20, 1), (15, 3), (30, 250)]
    hashes = generate_hashes(peaks, fan_value=3)
    # every hash is 20 hex chars + int offset
    for h, t in hashes:
        assert len(h) == 20 and int(h, 16) >= 0
    # (10,0)-(30,250): dt 250 > 200 excluded
    import hashlib

    excluded = hashlib.sha1(b"10|30|250").hexdigest()[:20]
    assert excluded not in [h for h, _ in hashes]
    # (10,0)-(20,1) pair present
    included = hashlib.sha1(b"10|20|1").hexdigest()[:20]
    assert (included, 0) in hashes


def test_fingerprint_single_channel(rng):
    x = (rng.standard_normal(16000) * 1000).astype(np.float32)
    hashes = fingerprint(x, Fs=8000, amp_min=10)
    assert len(hashes) > 0
    hashes2, mask, spec = fingerprint(x, Fs=8000, amp_min=10, get_masks=True)
    assert mask.shape[0] == 257
    assert spec.shape == mask.shape


# ------------------------------------------------------------ database

def test_sqlite_database_roundtrip():
    db = SQLiteDatabase(":memory:")
    db.setup()
    sid = db.insert_song("song_a", "ABCD", 3)
    db.insert_hashes(sid, [("aa11", 5), ("bb22", 9), ("cc33", 12)])
    db.set_song_fingerprinted(sid)
    assert db.get_num_songs() == 1
    assert db.get_num_fingerprints() == 3
    song = db.get_song_by_id(sid)
    assert song["song_name"] == "song_a"
    matches, dedup = db.return_matches([("AA11", 2), ("bb22", 4)])
    assert dedup == {sid: 2}
    assert (sid, 3) in matches  # 5 - 2
    assert (sid, 5) in matches  # 9 - 4


def test_sqlite_database_empty_and_unfingerprinted():
    db = SQLiteDatabase(":memory:")
    db.setup()
    db.insert_song("ghost", "FF", 0)  # never fingerprinted
    db.delete_unfingerprinted_songs()
    assert db.get_num_songs() == 0
    db.empty()
    assert db.get_num_fingerprints() == 0


# ------------------------------------------------------------ end-to-end

def _note_track(rng, seconds, sr=8000):
    t_len = seconds * sr
    x = np.zeros(t_len, np.float32)
    for _ in range(int(seconds * 25)):
        f = rng.uniform(80, 3500)
        start = int(rng.integers(0, t_len - sr // 8))
        dur = int(rng.integers(sr // 16, sr // 4))
        end = min(start + dur, t_len)
        seg = np.arange(end - start)
        x[start:end] += (
            np.sin(2 * np.pi * f * seg / sr).astype(np.float32)
            * np.exp(-8.0 * seg / sr).astype(np.float32)
            * rng.uniform(0.3, 1.0)
        )
    return x / np.abs(x).max()


@pytest.mark.slow
def test_dejavu_end_to_end_identification():
    sr = 8000
    rng = np.random.default_rng(7)
    tracks = [_note_track(rng, 6) for _ in range(8)]
    djv = Dejavu({"database": {"database": ":memory:"}}, state="set")
    djv.fingerprint_arrays([f"track_{i}" for i in range(8)], np.stack(tracks))
    assert djv.db.get_num_songs() == 8

    recognizer = FileRecognizer(djv)
    correct = 0
    n_queries = 5
    for _ in range(n_queries):
        tid = int(rng.integers(0, len(tracks)))
        start = int(rng.integers(0, len(tracks[tid]) - 2 * sr))
        crop = tracks[tid][start : start + 2 * sr]
        result = recognizer.recognize_file(crop)
        if result["match"] and result["results"]:
            name = result["results"][0]["song_name"].decode()
            if name == f"track_{tid}":
                correct += 1
    assert correct >= n_queries - 1, f"identified {correct}/{n_queries}"
    # timing fields present (ref file_recognizer.py:17-34)
    assert {"fingerprint_time", "query_time", "align_time"} <= set(result)


def test_fingerprint_batch_matches_single(rng):
    """Batched query fingerprints must equal the single-channel path."""
    djv = Dejavu({"database": {"database": ":memory:"}}, state="set")
    wavs = (rng.standard_normal((3, 16000)) * 0.5).astype(np.float32)
    batched = djv.fingerprint_batch(wavs)
    for i in range(3):
        single = fingerprint(wavs[i] * 32767.0, Fs=8000)
        assert sorted(batched[i]) == sorted(single)
