"""A/B parity against the ACTUAL reference implementation (VERDICT r3 #4).

Every other parity test in this suite bottoms out in this repo's own numpy
ports (afp/audfprint/matcher.py, afp/dejavu/fingerprint.py host paths). This
module imports the reference code itself from /root/reference — audfprint's
``peak_extractor``/``hash_table``/``audfprint_match`` and dejavu's
``fingerprint`` — with only its import-time checkpoint loads stubbed
(peak_extractor.py:24-37, fingerprint.py:27-31 load trained UNet/Demucs
weights from /workspace paths that do not exist here; the denoising paths
they feed are not exercised by these tests), and asserts on shared synthetic
fixtures that the rebuild produces:

- identical STFT magnitudes (audfprint stft.py:15-62),
- near-identical peak masks (F1 >= 0.99; exact equality is not guaranteed
  because the log/HPF frontend runs in f32 on device vs f64 in numpy, and
  the decaying-threshold envelope makes borderline cells seed-sensitive),
- exactly identical hash sets given the same peak list
  (peaks2landmarks/landmarks2hashes, peak_extractor.py:40-58,313-346),
- identical MATCH/NOMATCH verdicts + matched names through the full
  pipeline (reference Matcher vs this repo's fused DeviceMatcher),
- the same for dejavu's specgram/peak/SHA1-hash path (fingerprint.py:34-213).
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"

_ref_cache = {}


def _import_reference():
    """Import the reference modules once, with the /workspace checkpoint
    loads replaced by randomly-initialized state dicts (the models are only
    used on the denoising branches, which these tests never take)."""
    if _ref_cache:
        return _ref_cache
    for p in (REF, REF + "/afp"):
        if p not in sys.path:
            sys.path.insert(0, p)
    # training.utils imports GPUtil + tensorflow and its set_gpus() demands a
    # CUDA device; a stub module keeps the import light and CPU-bound.
    if "training.utils" not in sys.modules:
        import training  # noqa: F401  (empty package __init__)

        tu = types.ModuleType("training.utils")
        tu.set_gpus = lambda max_memory=0.05: "cpu"
        sys.modules["training.utils"] = tu
    # torchaudio is not installed; peak_extractor only uses Resample at the
    # reference's 8 kHz -> 8 kHz identity setting (WAVEFORM_SAMPLING_RATE ==
    # params["samplerate"]), so an identity stub is exact.
    if "torchaudio" not in sys.modules:
        ta = types.ModuleType("torchaudio")
        tat = types.ModuleType("torchaudio.transforms")

        class _Resample:
            def __init__(self, orig_freq, new_freq, *a, **k):
                if orig_freq != new_freq:
                    raise NotImplementedError(
                        "torchaudio stub supports identity resample only"
                    )

            def __call__(self, x):
                return x

        tat.Resample = _Resample
        ta.transforms = tat
        sys.modules["torchaudio"] = ta
        sys.modules["torchaudio.transforms"] = tat

    real_load = torch.load

    def fake_load(path, map_location=None, **kw):
        p = str(path)
        if "unet_lr" in p:
            from training.unet import UNet as RefUNet

            return {"model_state_dict": RefUNet(1, 1, rate=0.05).state_dict()}
        if "demucs_lr" in p:
            from training.model import Demucs as RefDemucs

            return {"model_state_dict": RefDemucs().state_dict()}
        return real_load(path, map_location=map_location, **kw)

    # psycopg2 is not installed; dejavu.dejavu imports it transitively via
    # postgres_database, but the orchestration logic under test
    # (align_matches) never touches a connection — a name-only stub keeps
    # the import alive.
    if "psycopg2" not in sys.modules:
        pg = types.ModuleType("psycopg2")
        pge = types.ModuleType("psycopg2.extras")
        pge.DictCursor = object
        pg.extras = pge
        sys.modules["psycopg2"] = pg
        sys.modules["psycopg2.extras"] = pge

    torch.load = fake_load
    try:
        import afp.audfprint.audfprint_match as ref_match
        import afp.audfprint.hash_table as ref_ht
        import afp.audfprint.peak_extractor as ref_pe
        import afp.audfprint.stft as ref_stft
        import dejavu.dejavu as ref_djv
        import dejavu.fingerprint as ref_dj
    finally:
        torch.load = real_load
    _ref_cache.update(
        stft=ref_stft, pe=ref_pe, ht=ref_ht, match=ref_match, dejavu=ref_dj,
        djv=ref_djv,
    )
    return _ref_cache


@pytest.fixture(scope="module")
def ref():
    return _import_reference()


def _music_like(seed: int, seconds: float = 8.0, sr: int = 8000) -> np.ndarray:
    """Deterministic music-like test signal: decaying harmonic notes on a
    noise floor (pure numpy so both frameworks see bit-identical input)."""
    rng = np.random.default_rng(seed)
    n = int(seconds * sr)
    t = np.arange(n) / sr
    x = 0.01 * rng.standard_normal(n)
    for _ in range(24):
        f0 = rng.uniform(80, 2000)
        on = rng.uniform(0, seconds - 0.5)
        dur = rng.uniform(0.2, 1.5)
        env = np.clip((t - on) / 0.01, 0, 1) * np.exp(
            -np.maximum(t - on, 0) / (dur / 3)
        ) * (t < on + dur)
        for h, a in ((1, 1.0), (2, 0.5), (3, 0.25)):
            x += a * rng.uniform(0.2, 0.6) * env * np.sin(
                2 * np.pi * f0 * h * t + rng.uniform(0, 2 * np.pi)
            )
    return (x / np.max(np.abs(x))).astype(np.float32)


AFP_PARAMS = {
    "density": 20,
    "pks-per-frame": 5,
    "freq-sd": 30,
    "shifts": 1,
    "samplerate": 8000,
    "n_fft": 512,
    "n_hop": 256,
}


def _ref_analyzer(ref):
    return ref["pe"].Audfprint_peaks(AFP_PARAMS, denoising=False)


def _mask_f1(a: np.ndarray, b: np.ndarray) -> float:
    inter = float(np.sum(a & b))
    return 2 * inter / max(float(np.sum(a) + np.sum(b)), 1.0)


def _as_pkl(tmp_path, name: str, wav: np.ndarray) -> str:
    """The reference's wavfile2hashes only accepts .pkl/.mp3 paths
    (peak_extractor.py:361-380) — stage the waveform as the pkl format its
    query pipeline uses (generate_queries.py pickles raw float arrays)."""
    import pickle

    p = str(tmp_path / f"{name}.pkl")
    with open(p, "wb") as f:
        pickle.dump(wav, f)
    return p


# --------------------------------------------------------------- audfprint


def test_stft_matches_reference(ref):
    """Our spectrogram frontend == reference numpy stft, normalized
    (ref: afp/audfprint/stft.py:15-62, peak_extractor.py:257-263)."""
    import jax.numpy as jnp

    from musicfpaugment_tpu.afp.audfprint.peaks import spectrogram_frontend

    x = _music_like(0)
    win = np.hanning(514)[1:-1]
    sg_ref = np.abs(
        ref["stft"].stft(x, n_fft=512, hop_length=256, window=win)
    )
    sg_ref /= np.max(sg_ref)
    sg_ours = np.asarray(spectrogram_frontend(jnp.asarray(x)[None], 512, 256))[0]
    assert sg_ours.shape == sg_ref.shape
    np.testing.assert_allclose(sg_ours, sg_ref, rtol=2e-4, atol=2e-6)


def test_peak_masks_match_reference(ref):
    """Peak masks from the reference's decaying-threshold pruner vs the
    lax.scan rebuild on identical audio: F1 >= 0.99 over several seeds
    (ref: peak_extractor.py:173-234,236-311)."""
    import jax.numpy as jnp

    from musicfpaugment_tpu.afp.audfprint.peaks import find_peaks_batch

    analyzer = _ref_analyzer(ref)
    worst = 1.0
    for seed in range(3):
        x = _music_like(seed)
        _, mask_ref, _ = analyzer.find_peaks(x)
        mask_ours = np.asarray(
            find_peaks_batch(jnp.asarray(x)[None], use_pallas=False)
        )[0]
        assert mask_ours.shape == mask_ref.shape
        f1 = _mask_f1(mask_ours.astype(bool), mask_ref.astype(bool))
        worst = min(worst, f1)
    assert worst >= 0.99, f"peak-mask F1 vs reference = {worst:.4f}"


def test_landmark_hashes_match_reference_exactly(ref):
    """Same peak list through both pairing+packing paths -> identical
    (time, hash) sets (ref: peak_extractor.py:40-58,313-346)."""
    from musicfpaugment_tpu.afp.audfprint.analyzer import AudfprintPeaks

    analyzer_ref = _ref_analyzer(ref)
    analyzer_ours = AudfprintPeaks(AFP_PARAMS)
    x = _music_like(1)
    pklist, _, _ = analyzer_ref.find_peaks(x)
    lms_ref = analyzer_ref.peaks2landmarks(pklist)
    h_ref = ref["pe"].landmarks2hashes(lms_ref)
    lms_ours = analyzer_ours.peaks2landmarks(pklist)
    from musicfpaugment_tpu.afp.audfprint.analyzer import landmarks2hashes

    h_ours = landmarks2hashes(lms_ours)
    assert len(h_ref) > 40
    set_ref = {(int(t), int(h)) for t, h in h_ref}
    set_ours = {(int(t), int(h)) for t, h in h_ours}
    assert set_ours == set_ref


def test_endtoend_hashes_close_to_reference(ref, tmp_path):
    """Waveform -> deduped hash set through each framework's own full
    pipeline: Jaccard >= 0.97 (peaks may differ at borderline cells)."""
    from musicfpaugment_tpu.afp.audfprint.analyzer import AudfprintPeaks

    analyzer_ref = _ref_analyzer(ref)
    analyzer_ours = AudfprintPeaks(AFP_PARAMS)
    x = _music_like(2)
    h_ref = analyzer_ref.wavfile2hashes(_as_pkl(tmp_path, "q", x))
    h_ours = analyzer_ours.wavfile2hashes(x)
    set_ref = {(int(t), int(h)) for t, h in h_ref}
    set_ours = {(int(t), int(h)) for t, h in h_ours}
    jac = len(set_ref & set_ours) / max(len(set_ref | set_ours), 1)
    assert jac >= 0.97, f"hash-set Jaccard vs reference = {jac:.4f}"


@pytest.mark.slow
def test_match_verdicts_match_reference(ref, tmp_path):
    """Full identification A/B: the same 8-track corpus indexed by each
    framework's own pipeline, the same member/non-member queries matched by
    the reference Matcher (audfprint_match.py:318-435) and by the fused
    DeviceMatcher — verdicts and matched names must agree on every query."""
    import jax.numpy as jnp

    from musicfpaugment_tpu.afp.audfprint import (
        AudfprintPeaks,
        DeviceMatcher,
        HashTable,
    )

    sr = 8000
    tracks = [_music_like(10 + i, seconds=12.0) for i in range(8)]
    names = [f"trk{i}" for i in range(8)]

    analyzer_ref = _ref_analyzer(ref)
    ht_ref = ref["ht"].HashTable()
    for name, wav in zip(names, tracks):
        ht_ref.store(
            name, analyzer_ref.wavfile2hashes(_as_pkl(tmp_path, name, wav))
        )

    analyzer_ours = AudfprintPeaks(AFP_PARAMS)
    ht_ours = HashTable()
    analyzer_ours.ingest_batch(ht_ours, names, np.stack(tracks))

    # queries: clean member crops + noisy member crops + pure-noise negatives
    rng = np.random.default_rng(99)
    queries, expect = [], []
    for i in (0, 3, 6):
        crop = tracks[i][2 * sr : 10 * sr]
        queries.append(crop)
        expect.append(names[i])
        queries.append(
            (crop + 0.05 * rng.standard_normal(crop.size)).astype(np.float32)
        )
        expect.append(names[i])
    queries.append(rng.standard_normal(8 * sr).astype(np.float32))
    expect.append(None)

    matcher_ref = ref["match"].Matcher()
    verdicts_ours = DeviceMatcher(ht_ours).match_waveforms(
        jnp.asarray(np.stack(queries)), shifts=1
    )
    for q, want, ours in zip(queries, expect, verdicts_ours):
        h = analyzer_ref.wavfile2hashes(_as_pkl(tmp_path, f"q{id(q)}", q))
        rslts, _ = matcher_ref.match_hashes(ht_ref, h)
        rslts = rslts[: matcher_ref.max_returns]
        if len(rslts) == 0:
            ref_verdict = ("NOMATCH", "")
        else:
            ref_verdict = ("MATCH", ht_ref.names[rslts[-1, 0]])
        assert ours[0] == ref_verdict[0], (want, ref_verdict, ours)
        if ref_verdict[0] == "MATCH":
            assert ours[1] == ref_verdict[1], (want, ref_verdict, ours)
            if want is not None:
                assert ref_verdict[1] == want


# ------------------------------------------------------------------ dejavu


def test_dejavu_peaks_and_hashes_match_reference(ref):
    """dejavu fingerprint A/B on identical int16-scaled samples: peak-mask
    F1 >= 0.99 and SHA1 hash-set Jaccard >= 0.97
    (ref: afp/dejavu/fingerprint.py:34-213)."""
    from musicfpaugment_tpu.afp.dejavu.fingerprint import fingerprint

    x = (_music_like(4) * 32767).astype(np.float64)
    h_ref, mask_ref, _ = ref["dejavu"].fingerprint(list(x), get_masks=True)
    h_ours, mask_ours, _ = fingerprint(x, get_masks=True)
    assert mask_ours.shape == mask_ref.shape
    f1 = _mask_f1(mask_ours.astype(bool), mask_ref.astype(bool))
    assert f1 >= 0.99, f"dejavu peak-mask F1 vs reference = {f1:.4f}"
    set_ref = {(h, int(t)) for h, t in h_ref}
    set_ours = {(h, int(t)) for h, t in h_ours}
    assert len(set_ref) > 50
    jac = len(set_ref & set_ours) / max(len(set_ref | set_ours), 1)
    assert jac >= 0.97, f"dejavu hash-set Jaccard vs reference = {jac:.4f}"


def test_dejavu_hashes_from_same_peaks_match_exactly(ref):
    """Same peak list -> identical SHA1 hash multisets through both
    generate_hashes implementations (ref: fingerprint.py:174-213)."""
    from musicfpaugment_tpu.afp.dejavu.fingerprint import generate_hashes

    x = (_music_like(5) * 32767).astype(np.float64)
    _, mask_ref, _ = ref["dejavu"].fingerprint(list(x), get_masks=True)
    f_idx, t_idx = np.nonzero(mask_ref)
    peaks = list(zip(f_idx.tolist(), t_idx.tolist()))
    h_ref = ref["dejavu"].generate_hashes(peaks, fan_value=3)
    h_ours = generate_hashes(peaks, fan_value=3)
    assert sorted(h_ref) == sorted(h_ours)
    assert len(h_ref) > 50


@pytest.mark.slow
def test_dejavu_low_snr_identification_rates_match_reference(ref):
    """Dejavu identification-rate A/B at low SNR (VERDICT r4 #2): the 106k
    scale run shows dejavu collapsing under -10 dB background noise
    (accuracy 0.001); this pins that behavior on dejavu itself, not on a
    rebuild divergence. The same corpus is indexed by the reference's own
    fingerprint() and matched through the reference's own
    Dejavu.align_matches (dejavu.py:312-378, return_matches dict semantics
    from postgres_database.py:181-229 replicated over a plain dict), and by
    this repo's DejavuDeviceIndex + DejavuDeviceMatcher — per-condition
    identification rates must agree within a small tolerance on identical
    clean / -5 dB / -10 dB queries."""
    from musicfpaugment_tpu.afp.dejavu import (
        DejavuDeviceIndex,
        DejavuDeviceMatcher,
    )
    from musicfpaugment_tpu.afp.dejavu.variables import MIN_HASHES

    sr, track_s, query_s = 8000, 10.0, 8.0
    n_tracks, n_queries = 200, 64
    tracks = [_music_like(1000 + i, seconds=track_s) for i in range(n_tracks)]
    names = [f"trk{i:03d}" for i in range(n_tracks)]

    # ---- reference side: fingerprint() into a dict store with the DB's
    # UNIQUE (song_id, offset, hash) dedup (postgres_database.py:273,293)
    db_rows, songs = {}, {}
    for sid, (name, wav) in enumerate(zip(names, tracks), start=1):
        hashes = ref["dejavu"].fingerprint(list(wav))
        triples = {(h.upper(), int(off)) for h, off in hashes}
        for h, off in sorted(triples):
            db_rows.setdefault(h, []).append((sid, off))
        songs[sid] = {
            "song_name": name,
            "total_hashes": len(triples),
            "file_sha1": "00" * 20,
        }

    class _StubDB:
        def get_song_by_id(self, sid):
            return songs[sid]

    stub = types.SimpleNamespace(
        db=_StubDB(), settings={"samplerate": sr, "n_hop": 256}
    )

    def ref_identify(query):
        hashes = ref["dejavu"].fingerprint(list(query))
        mapper = {}
        for h, off in hashes:
            mapper.setdefault(h.upper(), []).append(int(off))
        matches, dedup = [], {}
        for h, q_offs in mapper.items():
            for sid, db_off in db_rows.get(h, ()):
                dedup[sid] = dedup.get(sid, 0) + 1
                for q_off in q_offs:
                    matches.append((sid, db_off - q_off))
        if not matches:
            return None
        out = ref["djv"].Dejavu.align_matches(
            stub, matches, dedup, len(hashes)
        )
        return out[0] if out else None

    # ---- identical queries for both sides: member crops + white noise at
    # exact SNRs (the scale run's bn_m5/bn_m10 analog, pure numpy f32)
    rng = np.random.default_rng(7)
    qn = int(query_s * sr)
    qidx = rng.integers(0, n_tracks, n_queries)
    crops = []
    for i in qidx:
        s = int(rng.integers(0, int((track_s - query_s) * sr)))
        crops.append(tracks[i][s : s + qn])
    crops = np.stack(crops)
    conditions = {"clean": crops}
    for snr_db in (-5.0, -10.0):
        noise = rng.standard_normal(crops.shape).astype(np.float32)
        p_sig = np.mean(crops**2, axis=1, keepdims=True)
        p_noise = np.mean(noise**2, axis=1, keepdims=True)
        scale = np.sqrt(p_sig / (p_noise * 10 ** (snr_db / 10)))
        conditions[f"bn_{int(snr_db)}"] = (
            crops + scale.astype(np.float32) * noise
        )

    # ---- our side: device index + fused matcher over the same arrays
    idx = DejavuDeviceIndex()
    idx.ingest_arrays(names, np.stack(tracks))
    dm = DejavuDeviceMatcher(idx)

    rates = {}
    for cond, queries in conditions.items():
        ours = dm.match_waveforms(queries)
        hit_ref = hit_ours = 0
        for q, o, tid in zip(queries, ours, qidx):
            r = ref_identify(q)
            if (
                r is not None
                and r["nb_matches_with_offset"] > MIN_HASHES
                and r["song_name"].decode() == names[tid]
            ):
                hit_ref += 1
            if (
                o
                and o["nb_matches_with_offset"] > MIN_HASHES
                and o["song_name"].decode() == names[tid]
            ):
                hit_ours += 1
        rates[cond] = (hit_ref / n_queries, hit_ours / n_queries)

    print("identification rates (reference, ours):", rates)
    for cond, (r_ref, r_ours) in rates.items():
        assert abs(r_ref - r_ours) <= 0.08, (cond, rates)
    # the collapse itself is the reference's own behavior: monotone in SNR
    assert rates["clean"][0] >= rates["bn_-5"][0] >= rates["bn_-10"][0]
