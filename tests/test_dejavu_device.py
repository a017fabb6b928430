"""Device-side Dejavu matcher: hash-packing and full-verdict parity against
the host SQLite + align_matches oracle (afp/dejavu/matcher_device.py)."""

import numpy as np
import pytest

SR = 8000


def _tone_tracks(rng, n=5, seconds=6):
    out = []
    for _ in range(n):
        t = np.arange(seconds * SR)
        x = np.zeros(len(t), np.float32)
        for _ in range(seconds * 25):
            f = rng.uniform(80, 3500)
            s = int(rng.integers(0, len(t) - SR // 8))
            d = int(rng.integers(SR // 16, SR // 4))
            seg = np.arange(min(d, len(t) - s))
            x[s : s + len(seg)] += (
                np.sin(2 * np.pi * f * seg / SR) * np.exp(-8 * seg / SR)
            ).astype(np.float32)
        out.append(x / np.abs(x).max())
    return np.stack(out)


def test_pack_hashes_from_masks_matches_host(rng):
    """Device hash packing must reproduce the host peaks_from_mask ->
    pack_hashes -> set() pipeline exactly (same (key, t1) sets, same
    distinct counts)."""
    import jax

    from musicfpaugment_tpu.afp.dejavu.fingerprint import (
        pack_hashes,
        pack_hashes_from_masks,
        peaks_from_mask,
    )

    F, C = 64, 80
    masks = rng.random((3, F, C)) < 0.02
    masks[1] = False  # empty query
    keys, t1, valid, key_first, n_distinct, n_over = jax.device_get(
        pack_hashes_from_masks(np.asarray(masks), max_peaks=256)
    )
    assert int(n_over) == 0
    for b in range(masks.shape[0]):
        host = set(pack_hashes(peaks_from_mask(masks[b]), fan_value=3))
        dev = {
            (int(k), int(t))
            for k, t, v in zip(keys[b], t1[b], valid[b])
            if v
        }
        assert dev == host
        assert int(n_distinct[b]) == len(host)
        # key_first marks each distinct key exactly once
        assert int(key_first[b].sum()) == len({k for k, _ in host})


def test_pack_hashes_overflow_is_counted(rng):
    import jax

    from musicfpaugment_tpu.afp.dejavu.fingerprint import (
        pack_hashes_from_masks,
    )

    masks = np.asarray(rng.random((1, 32, 32)) < 0.5)
    *_rest, n_over = jax.device_get(
        pack_hashes_from_masks(masks, max_peaks=8)
    )
    assert int(n_over) == 1


@pytest.mark.slow
def test_device_matcher_matches_host_align(rng):
    """Full-verdict parity: DejavuDeviceMatcher vs the host Dejavu
    (SQLite + SHA1 + align_matches) on the same corpus and queries —
    song, aligned count, dedup count, offset, and the confidences."""
    from musicfpaugment_tpu.afp.dejavu import (
        Dejavu,
        DejavuDeviceIndex,
        DejavuDeviceMatcher,
    )
    from musicfpaugment_tpu.afp.dejavu.sqlite_database import SQLiteDatabase

    tracks = _tone_tracks(rng, n=5, seconds=6)
    names = [f"song_{i:02d}" for i in range(len(tracks))]

    # queries: 2 s crops (+1 light-noise variant, +1 pure-noise nonmatch)
    crops = []
    gts = []
    for i in range(len(tracks)):
        s = int(rng.integers(0, tracks.shape[1] - 2 * SR))
        crops.append(tracks[i, s : s + 2 * SR])
        gts.append(names[i])
    noisy = crops[0] + 0.01 * rng.standard_normal(2 * SR).astype(np.float32)
    crops.append(noisy.astype(np.float32))
    gts.append(names[0])
    crops.append(rng.standard_normal(2 * SR).astype(np.float32))
    gts.append(None)
    queries = np.stack(crops)

    # host oracle
    db = SQLiteDatabase(":memory:")
    djv = Dejavu({}, state="set", db=db)
    djv.fingerprint_arrays(names, tracks)
    host_results = []
    for q in queries:
        fps, _ = djv.generate_fingerprints(q)
        hashes = set(fps)
        matches, dedup, _ = djv.find_matches(hashes)
        host_results.append(djv.align_matches(matches, dedup, len(hashes)))

    # device path
    idx = DejavuDeviceIndex()
    idx.ingest_arrays(names, tracks)
    assert idx.total_hashes == [
        djv.db.get_song_by_id(i + 1)["total_hashes"]
        for i in range(len(names))
    ]
    dm = DejavuDeviceMatcher(idx)
    dev_results = dm.match_waveforms(queries)

    for qi, (host, dev) in enumerate(zip(host_results, dev_results)):
        if not host:
            assert dev == {}
            continue
        h = host[0]
        assert dev["song_name"].decode() == h["song_name"].decode()
        assert dev["nb_matches_with_offset"] == h["nb_matches_with_offset"]
        assert dev["hashes_matched_in_input"] == h["hashes_matched_in_input"]
        assert dev["input_total_hashes"] == h["input_total_hashes"]
        assert dev["fingerprinted_hashes_in_db"] == h["fingerprinted_hashes_in_db"]
        assert dev["offset"] == h["offset"]
        assert dev["offset_seconds"] == h["offset_seconds"]
        assert dev["input_confidence"] == h["input_confidence"]
        assert dev["fingerprinted_confidence"] == h["fingerprinted_confidence"]
    # the recognizer-style gate agrees with the ground truth on this corpus
    verdicts = dm.recognize_waveforms(queries)
    for v, gt in zip(verdicts, gts):
        if gt is None:
            assert not v["match"]
        else:
            assert v["match"]
            assert v["results"][0]["song_name"].decode() == gt


@pytest.mark.slow
def test_device_index_save_load_roundtrip(tmp_path, rng):
    from musicfpaugment_tpu.afp.dejavu import (
        DejavuDeviceIndex,
        DejavuDeviceMatcher,
    )

    tracks = _tone_tracks(rng, n=2, seconds=3)
    idx = DejavuDeviceIndex()
    idx.ingest_arrays(["a", "b"], tracks)
    p = str(tmp_path / "idx.npz")
    idx.save(p)
    idx2 = DejavuDeviceIndex.load(p)
    assert idx2.names == idx.names
    assert idx2.total_hashes == idx.total_hashes
    s1, r1, nb1, d1 = idx.finalize()
    s2, r2, nb2, d2 = idx2.finalize()
    np.testing.assert_array_equal(r1, r2)
    np.testing.assert_array_equal(s1, s2)
    assert (nb1, d1) == (nb2, d2)

    q = tracks[1, : 2 * SR][None]
    m1 = DejavuDeviceMatcher(idx).match_waveforms(q)
    m2 = DejavuDeviceMatcher(idx2).match_waveforms(q)
    assert m1 == m2


def test_hot_hash_cap_truncates_deterministically(rng):
    """max_rows_per_hash keeps the smallest (sid, offset) rows of a hot
    key; dropped rows are reported."""
    from musicfpaugment_tpu.afp.dejavu import DejavuDeviceIndex

    idx = DejavuDeviceIndex(max_rows_per_hash=3)
    for sid in range(6):
        idx.add_song(f"s{sid}", [(12345, sid)])  # same key, distinct offs
    starts, rows, nbuckets, depth = idx.finalize()
    assert idx.rows_dropped == 3
    assert depth == 3
    kept = rows[starts[12345] : starts[12346]]
    sids = (kept >> np.uint32(idx.timebits)).astype(int)
    np.testing.assert_array_equal(sids, [0, 1, 2])


@pytest.mark.slow
def test_batched_accuracy_matches_sequential(tmp_path, rng):
    """testing.dejavu_exps.compute_accuracy_batched (fused device path)
    must reproduce the per-file host compute_accuracy on the same corpus,
    queries, and denoiser hooks."""
    import os

    import scipy.io.wavfile

    from musicfpaugment_tpu.afp.dejavu import (
        Dejavu,
        DejavuDeviceIndex,
        DejavuDeviceMatcher,
    )
    from musicfpaugment_tpu.afp.dejavu.dejavu import read as djv_read
    from musicfpaugment_tpu.afp.dejavu.sqlite_database import SQLiteDatabase
    from musicfpaugment_tpu.testing.dejavu_exps import (
        compute_accuracy,
        compute_accuracy_batched,
    )
    from musicfpaugment_tpu.testing.generate_queries import (
        generate_clean_queries,
    )

    tracks = _tone_tracks(rng, n=5, seconds=6)
    track_dir = tmp_path / "tracks"
    os.makedirs(track_dir)
    paths = []
    for i, x in enumerate(tracks):
        p = str(track_dir / f"track_{i:03d}.wav")
        scipy.io.wavfile.write(p, SR, (x * 32000).astype(np.int16))
        paths.append(p)
    cleans = tmp_path / "cleans"
    generate_clean_queries(paths, str(cleans), duration=2, save=True)
    queries = [str(cleans / q) for q in sorted(os.listdir(cleans))]

    # host oracle: sequential per-file recognition
    db = SQLiteDatabase(":memory:")
    djv = Dejavu({}, state="set", db=db)
    djv.fingerprint_directory(paths)
    identity = lambda s: s
    djv_den = Dejavu(
        {}, state="set", denoising=True, denoising_model="unet",
        spec_denoiser=identity, db=db,
    )
    host = compute_accuracy(queries, djv, djv_den)

    # device path: same corpus through read() so fingerprints are identical
    idx = DejavuDeviceIndex()
    names = [str(p).split("/")[-1].split(".")[0] for p in paths]
    wavs = np.stack([djv_read(p, sample_rate=SR)[0][0] for p in paths])
    idx.ingest_arrays(names, wavs)
    dm1 = DejavuDeviceMatcher(idx)
    dm2 = DejavuDeviceMatcher(idx, spec_denoiser=identity)
    dev = compute_accuracy_batched(queries, dm1, dm2, batch_size=3)
    assert dev == host
    assert dev["No Denoising"] >= 0.8


def test_match_hash_lane_tier_is_bit_identical(rng):
    """The tiered match program (hash arrays sliced to the smallest pow2
    tier covering every in-range lane) must be bit-identical to the
    full-width program: dropped lanes hold only 1 << 30 sentinels, whose
    cells sort behind every real cell (matcher_device.py stage B)."""
    import jax.numpy as jnp

    from musicfpaugment_tpu.afp.dejavu.fingerprint import (
        fingerprint_spectrogram_batch,
        pack_hashes_from_masks,
    )
    from musicfpaugment_tpu.afp.dejavu.matcher_device import (
        DejavuDeviceIndex,
        DejavuDeviceMatcher,
        _dejavu_match_impl,
        _pow2ceil,
    )

    tracks = _tone_tracks(rng, n=4, seconds=6)
    idx = DejavuDeviceIndex()
    idx.ingest_arrays([f"s{i}" for i in range(len(tracks))], tracks)
    dm = DejavuDeviceMatcher(idx)

    queries = np.stack(
        [tracks[i, SR : SR + 2 * SR] for i in range(len(tracks))]
    )
    st = dm.settings
    T = queries.shape[1]
    n_frames = max(1, 1 + (T - st["n_fft"]) // st["n_hop"])
    mp = _pow2ceil(4 * n_frames)
    _, masks, _ = fingerprint_spectrogram_batch(
        jnp.asarray(queries), float(st["samplerate"]), int(st["n_fft"]),
        int(st["n_hop"]), st["amp_min"],
    )
    keys, t1, valid, kf, _nd, _nov = pack_hashes_from_masks(
        masks, mp, int(st["fan_value"])
    )
    n_used = int(jnp.max(jnp.sum(keys < (1 << 30), axis=-1)))
    h_tier = min(keys.shape[1], _pow2ceil(max(n_used, 16)))
    assert h_tier < keys.shape[1], "corpus too dense for the tier test"

    kw = dict(
        depth=dm.depth, num_ids=dm.num_ids, timebits=idx.timebits,
        mqf=dm._effective_mqf(n_frames), max_store_time=dm.eff_maxtime,
        nbuckets=dm.nbuckets,
    )
    full = _dejavu_match_impl(
        dm._starts, dm._rows, keys, t1, valid, kf, **kw
    )
    sl = lambda a: a[:, :h_tier]
    tiered = _dejavu_match_impl(
        dm._starts, dm._rows, sl(keys), sl(t1), sl(valid), sl(kf), **kw
    )
    for f, t in zip(full, tiered):
        np.testing.assert_array_equal(np.asarray(f), np.asarray(t))

    # and the public path (which now uses the tier internally) still
    # returns the right songs
    for i, r in enumerate(dm.match_waveforms(queries)):
        assert r and r["song_name"].decode() == f"s{i}"
