"""audfprint layer tests: scan kernel vs an independent numpy oracle,
hash packing, hash table semantics, matcher, and tiny-corpus identification
(SURVEY.md §4: golden-value tests of peak extraction / hash packing,
property tests for store/retrieve, end-to-end ident on a toy corpus)."""

import jax.numpy as jnp
import numpy as np
import pytest

from musicfpaugment_tpu.afp.audfprint import (
    AudfprintPeaks,
    HashTable,
    Matcher,
    hashes_from_mask,
    hashes_from_mask_np,
    landmarks2hashes,
)
from musicfpaugment_tpu.afp.audfprint.peaks import (
    backward_prune,
    forward_prune,
    log_hpf_frontend,
    spectrogram_frontend,
)

PARAMS = {
    "density": 20,
    "pks-per-frame": 5,
    "freq-sd": 30,
    "shifts": 1,
    "samplerate": 8000,
    "n_fft": 512,
    "n_hop": 256,
}


# ----------------------------------------------------- numpy oracle
# Independent loop implementation of the published decaying-threshold
# algorithm (Ellis' audfprint; ref peak_extractor.py:173-234) used as the
# golden reference for the scan kernel. float32 throughout to match.

def _gauss_row(p, F, width):
    i = np.arange(F)
    return np.exp(-0.5 * ((i - p) / width) ** 2).astype(np.float32)


def _locmax_np(v):
    n = len(v)
    nbr = np.zeros(n + 1, dtype=bool)
    nbr[0] = True
    nbr[1:-1] = v[1:] >= v[:-1]
    return nbr[:-1] & ~nbr[1:]


def _spread_init_np(v, width):
    F = len(v)
    th = np.zeros(F, np.float32)
    for p in np.nonzero(_locmax_np(v))[0]:
        th = np.maximum(th, v[p] * _gauss_row(p, F, width))
    return th


def oracle_prune(logsg, a_dec, f_sd=30.0, maxpks=5):
    logsg = logsg.astype(np.float32)
    F, C = logsg.shape
    # forward
    th = _spread_init_np(logsg[:, : min(10, C)].max(axis=1), f_sd)
    peaks = np.zeros((F, C), bool)
    for c in range(C):
        s = logsg[:, c]
        cand = np.nonzero(_locmax_np(s) & (s > th))[0]
        best = sorted(zip(s[cand], cand), reverse=True)[:maxpks]
        for val, p in best:
            th = np.maximum(th, val * _gauss_row(p, F, f_sd))
            peaks[p, c] = True
        th = th * np.float32(a_dec)
    # backward
    th = _spread_init_np(logsg[:, -1], f_sd)
    for c in range(C - 1, -1, -1):
        ps = np.nonzero(peaks[:, c])[0]
        for val, p in sorted(zip(logsg[ps, c], ps), reverse=True):
            if val >= th[p]:
                th = np.maximum(th, val * _gauss_row(p, F, f_sd))
                if c + 1 < C:
                    peaks[p, c + 1] = False
            else:
                peaks[p, c] = False
        th = th * np.float32(a_dec)
    return peaks


def _fake_logsgram(rng, F=64, C=50):
    """Random smooth spectrogram-like field, log-mean-subtracted."""
    x = rng.standard_normal((F, C)).astype(np.float32)
    # smooth to create realistic peak structure
    from scipy.ndimage import gaussian_filter

    x = gaussian_filter(x, sigma=(2.0, 1.5)).astype(np.float32)
    return (x - x.mean()).astype(np.float32) * 3.0


def test_forward_prune_matches_oracle(rng):
    a_dec = float(1 - 0.01 * (20 * np.sqrt(256 / 352.8) / 35))
    for seed in range(3):
        r = np.random.default_rng(seed)
        logsg = _fake_logsgram(r)
        want_fwd = _oracle_forward_only(logsg, a_dec)
        got = np.asarray(forward_prune(jnp.asarray(logsg)[None], a_dec, 30.0, 5))[0]
        agreement = (got == want_fwd).mean()
        assert agreement > 0.999, f"seed {seed}: fwd agreement {agreement}"


def _oracle_forward_only(logsg, a_dec, f_sd=30.0, maxpks=5):
    logsg = logsg.astype(np.float32)
    F, C = logsg.shape
    th = _spread_init_np(logsg[:, : min(10, C)].max(axis=1), f_sd)
    peaks = np.zeros((F, C), bool)
    for c in range(C):
        s = logsg[:, c]
        cand = np.nonzero(_locmax_np(s) & (s > th))[0]
        best = sorted(zip(s[cand], cand), reverse=True)[:maxpks]
        for val, p in best:
            th = np.maximum(th, val * _gauss_row(p, F, f_sd))
            peaks[p, c] = True
        th = th * np.float32(a_dec)
    return peaks


def test_full_prune_matches_oracle(rng):
    a_dec = float(1 - 0.01 * (20 * np.sqrt(256 / 352.8) / 35))
    total, agree = 0, 0
    for seed in range(4):
        r = np.random.default_rng(100 + seed)
        logsg = _fake_logsgram(r, F=96, C=80)
        want = oracle_prune(logsg, a_dec)
        sj = jnp.asarray(logsg)[None]
        fwd = forward_prune(sj, a_dec, 30.0, 5)
        got = np.asarray(backward_prune(sj, fwd, a_dec, 30.0, 5))[0]
        total += want.size
        agree += (got == want).sum()
    assert agree / total > 0.999, f"full-prune agreement {agree/total}"


def test_prune_batched_equals_single(rng):
    a_dec = 0.99
    r = np.random.default_rng(7)
    logsgs = np.stack([_fake_logsgram(r) for _ in range(3)])
    batched_fwd = forward_prune(jnp.asarray(logsgs), a_dec, 30.0, 5)
    batched = np.asarray(
        backward_prune(jnp.asarray(logsgs), batched_fwd, a_dec, 30.0, 5)
    )
    for i in range(3):
        single_fwd = forward_prune(jnp.asarray(logsgs[i : i + 1]), a_dec, 30.0, 5)
        single = np.asarray(
            backward_prune(jnp.asarray(logsgs[i : i + 1]), single_fwd, a_dec, 30.0, 5)
        )[0]
        np.testing.assert_array_equal(batched[i], single)


def test_log_hpf_frontend_matches_scipy(rng):
    """The FFT-conv IIR must equal scipy lfilter([1,-1],[1,-0.98])
    (ref: peak_extractor.py:286-290)."""
    import scipy.signal

    r = np.random.default_rng(8)
    sgram = np.abs(r.standard_normal((1, 33, 40))).astype(np.float32)
    got = np.asarray(log_hpf_frontend(jnp.asarray(sgram)))[0]
    s = sgram[0]
    logsg = np.log(np.maximum(s, s.max() / 1e6))
    logsg -= logsg.mean()
    want = np.stack(
        [scipy.signal.lfilter([1, -1], [1, -0.98], row) for row in logsg]
    )[:-1]
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


# ----------------------------------------------------- hashes

def test_hash_packing_parity():
    landmarks = [(10, 200, 220, 5), (11, 100, 90, 62), (0, 255, 250, 2)]
    got = landmarks2hashes(landmarks)
    # independent packing
    for (t, b1, b2, dt), (gt, gh) in zip(landmarks, got):
        assert gt == t
        assert gh == ((b1 & 255) << 12 | ((b2 - b1) & 63) << 6 | (dt & 63))


def test_hashes_from_mask_device_equals_np(rng):
    r = np.random.default_rng(9)
    mask = r.random((64, 60)) < 0.03
    want = hashes_from_mask_np(mask)
    th, valid = hashes_from_mask(jnp.asarray(mask), max_peaks=256, max_hashes=1024)
    got = np.asarray(th)[np.asarray(valid)]
    np.testing.assert_array_equal(got, want)


def test_hashes_fanout_capped():
    # a dense column region would produce many pairs; each peak <= 3
    mask = np.zeros((64, 70), bool)
    mask[30, 0] = True
    for c in range(2, 40):
        mask[30 + (c % 3), c] = True
    h = hashes_from_mask_np(mask)
    t0 = h[h[:, 0] == 0]
    assert len(t0) <= 3


# ----------------------------------------------------- hash table

def test_hash_table_store_retrieve():
    ht = HashTable(hashbits=10, depth=8, maxtime=4096)
    pairs = np.array([[5, 100], [10, 100], [3, 200], [7, 1023]], np.int32)
    ht.store("track_a", pairs)
    entry = ht.get_entry(100)
    assert entry.shape == (2, 2)
    assert set(entry[:, 1].tolist()) == {5, 10}
    assert (entry[:, 0] == 0).all()
    rt = ht.retrieve("track_a")
    assert len(rt) == 4


def test_hash_table_get_hits():
    ht = HashTable(hashbits=10, depth=8, maxtime=4096)
    ht.store("a", np.array([[5, 100], [9, 300]], np.int32))
    ht.store("b", np.array([[50, 100]], np.int32))
    hits = ht.get_hits(np.array([[2, 100]], np.int32))
    assert hits.shape == (2, 4)
    # [id, dt, hash, time]
    by_id = {row[0]: row for row in hits.tolist()}
    assert by_id[0][1] == 3  # 5 - 2
    assert by_id[1][1] == 48  # 50 - 2


def test_hash_table_overflow_reservoir():
    ht = HashTable(hashbits=10, depth=4, maxtime=4096)
    pairs = np.stack([np.arange(100), np.full(100, 7)], axis=1).astype(np.int32)
    ht.store("a", pairs)
    assert ht.counts[7] == 100
    # only depth slots retained, all valid values
    entry = ht.get_entry(7)
    assert entry.shape == (4, 2)
    assert all(0 <= t < 100 for t in entry[:, 1])


def test_hash_table_save_load(tmp_path):
    ht = HashTable(hashbits=10, depth=8, maxtime=4096)
    ht.store("x", np.array([[1, 5], [2, 6]], np.int32))
    p = str(tmp_path / "db")
    ht.save(p)
    ht2 = HashTable(filename=p)
    assert ht2.names == ["x"]
    np.testing.assert_array_equal(ht2.counts, ht.counts)
    np.testing.assert_array_equal(ht2.table, ht.table)


def test_hash_table_remove():
    ht = HashTable(hashbits=10, depth=8, maxtime=4096)
    ht.store("a", np.array([[1, 5]], np.int32))
    ht.store("b", np.array([[2, 5]], np.int32))
    ht.remove("a")
    entry = ht.get_entry(5)
    assert entry.shape == (1, 2)
    assert entry[0, 0] == 1  # only b remains


# ----------------------------------------------------- matcher + e2e

def _tone_track(rng, seconds, sr=8000):
    """Onset-rich synthetic 'music': many short decaying note bursts.

    audfprint's one-pole onset-emphasis HPF plus the backward same-bin kill
    suppress steady tones by design, so identification test signals need
    transient structure like real music.
    """
    t = np.arange(seconds * sr) / sr
    x = np.zeros_like(t, np.float32)
    n_notes = int(seconds * 25)
    for _ in range(n_notes):
        f = rng.uniform(80, 3500)
        start = int(rng.integers(0, len(t) - sr // 8))
        dur = int(rng.integers(sr // 16, sr // 4))
        end = min(start + dur, len(t))
        seg = np.arange(end - start)
        env = np.exp(-8.0 * seg / sr).astype(np.float32)  # sharp attack
        x[start:end] += (
            np.sin(2 * np.pi * f * seg / sr).astype(np.float32)
            * env
            * rng.uniform(0.3, 1.0)
        )
    x += 0.005 * rng.standard_normal(len(t)).astype(np.float32)
    return x / np.abs(x).max()


@pytest.mark.slow
def test_end_to_end_identification(rng):
    """Index 12 synthetic tracks, query 8 crops, expect exact identification."""
    sr = 8000
    r = np.random.default_rng(42)
    tracks = [_tone_track(r, seconds=6) for _ in range(12)]
    analyzer = AudfprintPeaks(PARAMS)
    ht = HashTable()
    analyzer.ingest_batch(
        ht, [f"track_{i}" for i in range(len(tracks))], np.stack(tracks)
    )
    matcher = Matcher()
    correct = 0
    n_queries = 8
    for q in range(n_queries):
        tid = int(r.integers(0, len(tracks)))
        start = int(r.integers(0, len(tracks[tid]) - 2 * sr))
        crop = tracks[tid][start : start + 2 * sr]
        q_hashes = analyzer.hashes_batch(crop[None, :])[0]
        status, name, aligned = matcher.hashes_match_to_msgs(ht, q_hashes)
        if status == "MATCH" and name == f"track_{tid}":
            correct += 1
    assert correct >= n_queries - 1, f"identified {correct}/{n_queries}"


def test_analyzer_find_peaks_shapes():
    r = np.random.default_rng(5)
    analyzer = AudfprintPeaks(PARAMS)
    wav = r.standard_normal(8000).astype(np.float32)
    pklist, mask, spec = analyzer.find_peaks(wav)
    assert mask.shape[0] == 256  # Nyquist dropped
    assert spec.shape[0] == 257
    assert len(pklist) > 0
    # pklist column-sorted
    cols = [c for c, _ in pklist]
    assert cols == sorted(cols)
    # peaks per frame bounded
    import collections

    counts = collections.Counter(cols)
    assert max(counts.values()) <= 5


# ----------------------------------------------------- pallas kernels

def test_pallas_prune_matches_scan(rng):
    """The fused Pallas kernels must agree with the scan implementation
    (interpret mode on CPU; compiled agreement is checked on TPU)."""
    from scipy.ndimage import gaussian_filter

    from musicfpaugment_tpu.afp.audfprint.peaks import (
        backward_prune,
        forward_prune,
    )
    from musicfpaugment_tpu.afp.audfprint.peaks_pallas import (
        backward_prune_pallas,
        forward_prune_pallas,
    )

    a_dec = float(1 - 0.01 * (20 * np.sqrt(256 / 352.8) / 35))
    r = np.random.default_rng(3)
    x = gaussian_filter(
        r.standard_normal((4, 128, 60)), sigma=(0, 2.0, 1.5)
    ).astype(np.float32) * 3
    xj = jnp.asarray(x - x.mean(axis=(1, 2), keepdims=True))

    ref_f = np.asarray(forward_prune(xj, a_dec, 30.0, 5))
    pal_f = np.asarray(forward_prune_pallas(xj, a_dec, 30.0, 5, interpret=True))
    assert (ref_f == pal_f).mean() > 0.9999

    ref_b = np.asarray(backward_prune(xj, jnp.asarray(ref_f), a_dec, 30.0, 5))
    pal_b = np.asarray(
        backward_prune_pallas(xj, jnp.asarray(ref_f), a_dec, 30.0, 5, interpret=True)
    )
    assert (ref_b == pal_b).mean() > 0.9999


def test_pallas_prune_matches_scan_long(rng):
    """Track-length input (C=600 spans 3 column tiles incl. a ragged tail):
    the envelope must carry across tile boundaries bit-exactly in both scan
    directions."""
    from scipy.ndimage import gaussian_filter

    from musicfpaugment_tpu.afp.audfprint.peaks import (
        backward_prune,
        forward_prune,
    )
    from musicfpaugment_tpu.afp.audfprint.peaks_pallas import (
        backward_prune_pallas,
        forward_prune_pallas,
    )

    a_dec = float(1 - 0.01 * (20 * np.sqrt(256 / 352.8) / 35))
    r = np.random.default_rng(11)
    x = gaussian_filter(
        r.standard_normal((2, 256, 600)), sigma=(0, 2.0, 1.5)
    ).astype(np.float32) * 3
    xj = jnp.asarray(x - x.mean(axis=(1, 2), keepdims=True))

    ref_f = np.asarray(forward_prune(xj, a_dec, 30.0, 5))
    pal_f = np.asarray(forward_prune_pallas(xj, a_dec, 30.0, 5, interpret=True))
    assert (ref_f == pal_f).mean() > 0.9999

    ref_b = np.asarray(backward_prune(xj, jnp.asarray(ref_f), a_dec, 30.0, 5))
    pal_b = np.asarray(
        backward_prune_pallas(xj, jnp.asarray(ref_f), a_dec, 30.0, 5, interpret=True)
    )
    assert (ref_b == pal_b).mean() > 0.9999


def test_hashes_batch_device_matches_host(rng):
    """The vmapped device hasher must be bit-identical to the host oracle
    loop, including shift merging (analyzer.hashes_batch paths)."""
    from musicfpaugment_tpu.afp.audfprint import AudfprintPeaks
    from musicfpaugment_tpu.testing.parameters import afp_settings

    a = AudfprintPeaks(afp_settings["audfprint"])
    wavs = rng.standard_normal((3, 2 * 8000)).astype(np.float32)
    dev = a.hashes_batch(wavs, shifts=2, device_hashing=True)
    host = a.hashes_batch(wavs, shifts=2, device_hashing=False)
    for d, h in zip(dev, host):
        np.testing.assert_array_equal(d, h)
    assert all(len(d) > 50 for d in dev)


# ----------------------------------------------------- mixed-length batches

@pytest.mark.slow
def test_padded_peaks_match_unpadded(rng):
    """VERDICT r2 #7: a mixed-length batch padded by pad_waveform_batch and
    masked via valid_frames yields, per example, exactly the peak mask of
    running that example alone at its true length."""
    from musicfpaugment_tpu.afp.audfprint.analyzer import (
        pad_waveform_batch,
        valid_frames_for,
    )
    from musicfpaugment_tpu.afp.audfprint.peaks import find_peaks_batch

    r = np.random.default_rng(7)
    lens = [20000, 17500, 16000]
    wavs = [_tone_track(r, seconds=3)[:L] for L in lens]
    batch, valid_samples = pad_waveform_batch(wavs)
    vf = np.asarray(valid_frames_for(valid_samples), np.int32)
    masks = np.asarray(
        find_peaks_batch(jnp.asarray(batch), valid_frames=jnp.asarray(vf))
    )
    for i, w in enumerate(wavs):
        solo = np.asarray(find_peaks_batch(jnp.asarray(w)[None]))[0]
        C = solo.shape[-1]
        assert C == vf[i]
        np.testing.assert_array_equal(masks[i, :, :C], solo)
        assert not masks[i, :, C:].any()  # no peaks past the real end


def test_mixed_length_accuracy_matches_per_file(rng):
    """Mixed-length queries through both batched matching paths (staged
    hashes_batch -> match_hashes_batch, and the fused match_waveforms with
    valid_samples) produce exactly the per-file hashes and verdicts."""
    from musicfpaugment_tpu.afp.audfprint import DeviceMatcher
    from musicfpaugment_tpu.afp.audfprint.analyzer import pad_waveform_batch

    sr = 8000
    r = np.random.default_rng(21)
    tracks = [_tone_track(r, seconds=6) for _ in range(8)]
    analyzer = AudfprintPeaks(PARAMS)
    ht = HashTable()
    analyzer.ingest_batch(
        ht, [f"track_{i}" for i in range(len(tracks))], np.stack(tracks)
    )

    qlens = [2 * sr, 2 * sr - 3000, sr + 5000, 2 * sr - 1]
    queries, gts = [], []
    for q, L in enumerate(qlens):
        tid = q % len(tracks)
        start = int(r.integers(0, len(tracks[tid]) - L))
        queries.append(tracks[tid][start : start + L])
        gts.append(f"track_{tid}")

    batch, valid_samples = pad_waveform_batch(queries)

    # per-query hash parity: padded+masked batch == each file alone
    batched_hashes = analyzer.hashes_batch(
        batch, shifts=2, valid_samples=valid_samples
    )
    for q, w in enumerate(queries):
        solo = analyzer.hashes_batch(w[None], shifts=2)[0]
        np.testing.assert_array_equal(batched_hashes[q], solo)

    dm = DeviceMatcher(ht)
    verdicts_staged = dm.match_hashes_batch(batched_hashes)
    verdicts_fused = dm.match_waveforms(
        batch, shifts=2, valid_samples=valid_samples
    )
    solo_verdicts = [
        dm.match_hashes_batch([analyzer.hashes_batch(w[None], shifts=2)[0]])[0]
        for w in queries
    ]
    assert verdicts_staged == solo_verdicts
    assert verdicts_fused == solo_verdicts
    for v, gt in zip(verdicts_fused, gts):
        assert v[0] == "MATCH" and v[1] == gt


def test_compact_valid_first_matches_stable_sort(rng):
    """The rank-scatter compaction must reproduce the stable
    sort-on-validity formulation exactly: valid rows packed first in
    original order, truncation keeps the earliest entries."""
    import jax

    from musicfpaugment_tpu.afp.audfprint import landmarks as lm

    r = np.random.default_rng(5)
    B, K = 7, 100
    t = jnp.asarray(r.integers(0, 50, (B, K)).astype(np.int32))
    h = jnp.asarray(r.integers(0, 1 << 20, (B, K)).astype(np.int32))
    v = jnp.asarray(r.random((B, K)) < 0.4)
    for out_len in (K, 17):
        tc, hc, n = jax.device_get(lm.compact_valid_first(t, h, v, out_len))
        tn, hn, vn = np.asarray(t), np.asarray(h), np.asarray(v)
        for b in range(B):
            keep_t, keep_h = tn[b][vn[b]], hn[b][vn[b]]
            m = min(len(keep_t), out_len)
            assert n[b] == vn[b].sum()
            np.testing.assert_array_equal(tc[b, :m], keep_t[:m])
            np.testing.assert_array_equal(hc[b, :m], keep_h[:m])
            assert (tc[b, m:] == 0).all() and (hc[b, m:] == 0).all()
