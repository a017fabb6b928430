"""DeviceMatcher parity vs the numpy Matcher oracle (VERDICT r1 #5).

A synthetic corpus is indexed, and queries (true crops with hash corruption +
pure-junk queries) are matched through both paths; verdict, name, and aligned
count must agree.
"""

import numpy as np
import pytest

from musicfpaugment_tpu.afp.audfprint import DeviceMatcher, HashTable, Matcher


def _synthetic_tracks(rng, n_tracks=24, hashes_per_track=400):
    """(time, hash) arrays with track-distinct hash vocabularies plus shared
    collisions so candidate filtering is exercised."""
    tracks = []
    for i in range(n_tracks):
        times = np.sort(rng.integers(0, 900, hashes_per_track)).astype(np.int64)
        own = rng.integers(0, 2**20, hashes_per_track)
        # 20% shared hashes across the corpus -> cross-track hits
        shared = rng.integers(0, 5000, hashes_per_track)
        use_shared = rng.random(hashes_per_track) < 0.2
        hashes = np.where(use_shared, shared, own)
        tracks.append(np.stack([times, hashes], axis=1))
    return tracks


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(5)
    tracks = _synthetic_tracks(rng)
    ht = HashTable()
    for i, th in enumerate(tracks):
        ht.store(f"track{i:03d}", th)
    return ht, tracks, rng


def _queries(tracks, rng, n=32):
    qs = []
    for qi in range(n):
        if qi % 4 == 3:  # junk query: random hashes, should NOMATCH
            t = np.sort(rng.integers(0, 250, 80))
            h = rng.integers(2**19, 2**20, 80)
            qs.append(np.stack([t, h], axis=1))
            continue
        ti = int(rng.integers(0, len(tracks)))
        th = tracks[ti]
        start = int(rng.integers(0, 600))
        sel = th[(th[:, 0] >= start) & (th[:, 0] < start + 250)].copy()
        sel[:, 0] -= start
        # corrupt 30% of the hashes (augmentation damage)
        bad = rng.random(len(sel)) < 0.3
        sel[bad, 1] = rng.integers(0, 2**20, bad.sum())
        qs.append(sel)
    return qs


def test_device_matcher_parity(corpus):
    ht, tracks, rng = corpus
    queries = _queries(tracks, rng)
    oracle = Matcher()
    dm = DeviceMatcher(ht)
    got = dm.match_hashes_batch(queries)
    assert len(got) == len(queries)
    n_match = 0
    for q, (status, name, count) in zip(queries, got):
        o_status, o_name, o_count = oracle.hashes_match_to_msgs(ht, q)
        assert status == o_status, (status, o_status)
        if status == "MATCH":
            n_match += 1
            assert name == o_name
            # counts agree except the documented +-window local-max corner
            assert abs(count - o_count) <= 2, (count, o_count)
    assert n_match >= len(queries) // 2  # the true-crop queries must match


def test_device_matcher_batch_invariance(corpus):
    ht, tracks, rng = corpus
    queries = _queries(tracks, np.random.default_rng(9), n=12)
    dm = DeviceMatcher(ht)
    full = dm.match_hashes_batch(queries)
    halves = dm.match_hashes_batch(queries[:6]) + dm.match_hashes_batch(queries[6:])
    assert full == halves


def test_device_matcher_empty_and_zero_queries(corpus):
    ht, _, _ = corpus
    dm = DeviceMatcher(ht)
    out = dm.match_hashes_batch([np.zeros((0, 2), np.int64)])
    assert out == [("NOMATCH", "", 0)]
    assert dm.match_hashes_batch([]) == []


def test_device_matcher_refresh(corpus):
    ht, tracks, _ = corpus
    dm = DeviceMatcher(ht)
    new = np.stack(
        [np.arange(100, dtype=np.int64), np.arange(100, dtype=np.int64) + 7],
        axis=1,
    )
    ht.store("late_track", new)
    dm.refresh()
    q = new[10:60].copy()
    q[:, 0] -= 10
    (status, name, count) = dm.match_hashes_batch([q])[0]
    assert status == "MATCH" and name == "late_track"


@pytest.mark.slow
def test_match_waveforms_fused_equals_staged(corpus):
    """The single-program waveform->verdict path must agree with the staged
    peaks->hashes->match path (identical hashing + matching semantics)."""
    import jax

    from musicfpaugment_tpu.afp.audfprint import AudfprintPeaks, HashTable
    from musicfpaugment_tpu.testing.parameters import afp_settings

    rng = np.random.default_rng(11)
    analyzer = AudfprintPeaks(afp_settings["audfprint"])
    tracks = rng.standard_normal((6, 6 * 8000)).astype(np.float32)
    ht = HashTable()
    analyzer.ingest_batch(ht, [f"w{i}" for i in range(6)], tracks)
    dm = DeviceMatcher(ht)

    queries = np.stack(
        [tracks[i % 6, 8000 : 8000 + 2 * 8000] for i in range(4)]
    )
    for shifts in (1, 2):
        staged = dm.match_hashes_batch(
            analyzer.hashes_batch(queries, shifts=shifts)
        )
        fused = dm.match_waveforms(queries, shifts=shifts)
        assert fused == staged, (shifts, fused, staged)
    # 2 s crops of noise tracks: most, but not necessarily all, match
    assert sum(v[0] == "MATCH" for v in fused) >= 1


def test_bincount_rows_matches_numpy():
    from musicfpaugment_tpu.afp.audfprint.matcher_device import _bincount_rows

    rng = np.random.default_rng(3)
    vals = rng.integers(0, 40, size=(5, 333)).astype(np.int32)
    vals[0, :10] = 39  # heavy collisions
    vals[1] = 7  # single value everywhere
    vals[2, ::3] = 50  # out-of-range -> dropped
    got = np.asarray(_bincount_rows(vals, 40))
    for b in range(5):
        keep = vals[b] < 40
        want = np.bincount(vals[b][keep], minlength=40)
        np.testing.assert_array_equal(got[b], want)


def test_sort_dedup_hashes_semantics():
    from musicfpaugment_tpu.afp.audfprint.landmarks import sort_dedup_hashes

    t = np.array([[5, 1, 5, 1, 9, 1]], np.int32)
    h = np.array([[2, 7, 2, 7, 0, 3]], np.int32)
    v = np.array([[True, True, True, False, True, True]])
    ts, hs, vs = (np.asarray(x) for x in sort_dedup_hashes(t, h, v))
    rows = [(int(a), int(b)) for a, b, k in zip(ts[0], hs[0], vs[0]) if k]
    # (1,7) kept once, invalid (1,7) dropped, (5,2) deduped, order ascending
    assert rows == [(1, 3), (1, 7), (5, 2), (9, 0)]


def test_eff_maxtime_covers_high_time_indices():
    """Histogram slicing (eff_maxtime) must still match tracks stored near
    the top of the 2^14 frame range (regression guard for the time-range
    optimization)."""
    ht = HashTable()
    t0 = 16000  # near maxtime 16384
    times = np.arange(t0, t0 + 300, dtype=np.int64)
    hashes = (np.arange(300, dtype=np.int64) * 2654435761) % (2**20)
    ht.store("late_in_time", np.stack([times, hashes], axis=1))
    dm = DeviceMatcher(ht)
    assert dm.eff_maxtime >= t0 + 300
    q = np.stack([np.arange(50, dtype=np.int64),
                  hashes[120:170]], axis=1)
    status, name, count = dm.match_hashes_batch([q])[0]
    assert status == "MATCH" and name == "late_in_time"
    assert count >= 40


@pytest.mark.slow
def test_depth100_reservoir_regime_parity():
    """VERDICT r2 #1 (CPU regression of the scale regime): a reduced-hashbits
    table forces every bucket past depth 100 — reservoir sampling during
    store, eff_depth == 100, and the deep-gather/histogram matcher path —
    and the DeviceMatcher must still agree with the numpy oracle on the
    identical (overflowed) table."""
    rng = np.random.default_rng(11)
    ht = HashTable(hashbits=8, depth=100, maxtime=16384)
    tracks = []
    for i in range(48):
        times = np.sort(rng.integers(0, 900, 700)).astype(np.int64)
        hashes = rng.integers(0, 2**8, 700)  # 256 buckets only
        th = np.stack([times, hashes], axis=1)
        tracks.append(th)
        ht.store(f"track{i:03d}", th)
    assert int(ht.counts.max()) > ht.depth  # reservoir actually ran
    dropped = ht.totalhashes() - int(np.sum(np.minimum(ht.depth, ht.counts)))
    assert dropped > 0

    # this collision regime makes nearly every hit a candidate cell, so the
    # default 16k cell budget truncates — raise it so parity stays exact
    dm = DeviceMatcher(ht, cell_budget=1 << 16)
    assert dm.eff_depth == 100

    oracle = Matcher()
    qs = []
    for qi in range(12):
        ti = qi % len(tracks)
        th = tracks[ti]
        start = int(rng.integers(0, 600))
        sel = th[(th[:, 0] >= start) & (th[:, 0] < start + 250)].copy()
        sel[:, 0] -= start
        qs.append(sel)
    device = dm.match_hashes_batch(qs)
    for q, dv in zip(qs, device):
        ov = oracle.hashes_match_to_msgs(ht, q)
        assert dv[0] == ov[0]
        if ov[0] == "MATCH":
            assert dv[1] == ov[1] and dv[2] == ov[2]

    # graceful degradation: a tiny budget truncates the LOWEST-ranked
    # candidates' cells first (the compaction orders by (rank, dt)), so the
    # true-match verdicts survive — and the overflow is reported loudly
    dm_small = DeviceMatcher(ht, cell_budget=2048)
    with pytest.warns(UserWarning, match="candidate-cell budget"):
        truncated = dm_small.match_hashes_batch(qs)
    assert truncated == device


def test_match_waveform_lane_tier_is_bit_identical():
    """Stage B's lane tier (compacted hash arrays sliced to the smallest
    pow2 tier covering every used lane) must be bit-identical to the
    full-budget program: padded lanes are qvalid=False, so their cells are
    sentinels that sort behind every real hit (matcher_device.py
    match_waveforms)."""
    import jax
    import jax.numpy as jnp

    from musicfpaugment_tpu.afp.audfprint import AudfprintPeaks, HashTable
    from musicfpaugment_tpu.afp.audfprint import landmarks as _lm
    from musicfpaugment_tpu.afp.audfprint.matcher_device import _match_impl
    from musicfpaugment_tpu.afp.audfprint.peaks import find_peaks_batch
    from musicfpaugment_tpu.testing.parameters import afp_settings

    rng = np.random.default_rng(17)
    analyzer = AudfprintPeaks(afp_settings["audfprint"])
    tracks = rng.standard_normal((6, 6 * 8000)).astype(np.float32)
    ht = HashTable()
    analyzer.ingest_batch(ht, [f"w{i}" for i in range(6)], tracks)
    dm = DeviceMatcher(ht)

    queries = jnp.asarray(
        np.stack([tracks[i % 6, 8000 : 8000 + 2 * 8000] for i in range(4)])
    )
    n_hop = 256
    n_frames = 1 + queries.shape[1] // n_hop
    mqf = dm._effective_mqf(n_frames - 1)
    masks = find_peaks_batch(queries, density=20.0, n_fft=512, n_hop=n_hop)
    C = int(masks.shape[-1])
    max_peaks = -(-5 * C // 128) * 128
    th, v = _lm.hashes_from_masks_batched(
        masks, max_peaks=max_peaks, max_hashes=max_peaks * _lm.MAXPAIRSPERPEAK
    )
    t, h, v = _lm.sort_dedup_hashes(th[..., 0], th[..., 1], v)
    n = int(t.shape[-1])
    t, h, nv = _lm.compact_valid_first(t, h, v, out_len=n)
    n_used = int(jnp.max(jnp.minimum(nv, n)))
    h_tier = min(n, 1 << int(np.ceil(np.log2(max(n_used, 16)))))
    assert h_tier < n, "queries too dense for the tier test"

    kw = dm._match_kwargs(mqf)
    vq_full = jnp.arange(n)[None, :] < jnp.minimum(nv, n)[:, None]
    full = _match_impl(
        dm._table, dm._counts, dm._hpit, t, h, vq_full, **kw
    )
    sl = lambda a: a[:, :h_tier]
    vq_tier = jnp.arange(h_tier)[None, :] < jnp.minimum(nv, h_tier)[:, None]
    tiered = _match_impl(
        dm._table, dm._counts, dm._hpit, sl(t), sl(h), vq_tier, **kw
    )
    for f, tr in zip(full, tiered):
        np.testing.assert_array_equal(np.asarray(f), np.asarray(tr))

    # the public path (tier picked internally) agrees with the staged
    # path verdict-for-verdict (the corpus is noise at 2 s crops, so most
    # queries legitimately NOMATCH — equality is the real invariant)
    staged = dm.match_hashes_batch(
        analyzer.hashes_batch(np.asarray(queries), shifts=1)
    )
    assert dm.match_waveforms(queries) == staged
