"""Reference-scale Dejavu identification proof (companion of
scale_proof.py for the second AFP system).

Same storage-free corpus as the audfprint proof — track ``i`` is a pure
function of ``fold_in(corpus_key, i)`` (data/synthetic.py
synth_tracks_device, same default seed, so the corpora are identical) —
indexed into a :class:`DejavuDeviceIndex` and queried through the fused
:class:`DejavuDeviceMatcher` across the paper's 11 augmentation conditions
(ref workload: testing/fma_preprocessing.py:10-18, testing/parameters.py:
3-15; dejavu engine: afp/dejavu/dejavu.py:295-378).

Stages (resumable, bounded by --minutes; state in --workdir):

  ingest  — generate + PSD-specgram + max-filter peaks + packed hashing +
            per-song dedup + valid-first compaction, all one XLA program
            per batch; ~2 MB download/batch, pipelined behind device
            compute. Checkpoints the raw index atomically.
  match   — finalize the CSR index (one lexsort), upload, run the
            conditions through the fused matcher; accuracy + q/s.
  oracle  — spot-check device verdicts against an independent Python
            reimplementation of return_matches + align_matches over the
            same CSR rows.
  report  — merge into examples/scale_out/dejavu_results.json.

Run (round-4 config: lossless hash cap 1024 per the committed cap sweep,
reference-shaped degradation banks):
  python examples/dejavu_scale.py ingest --tracks 106574 --minutes 8
  python examples/dejavu_scale.py match --banks dcase --denoise
  python examples/dejavu_scale.py oracle
  python examples/dejavu_scale.py report
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SR = 8000
TRACK_SECONDS = 30
QUERY_SECONDS = 8
HCAP = 2048  # per-track deduped-hash budget (synth 30 s tracks yield ~700)


def _state_path(workdir):
    return os.path.join(workdir, "state.json")


def _load_state(workdir):
    if os.path.exists(_state_path(workdir)):
        with open(_state_path(workdir)) as f:
            return json.load(f)
    return {}


def _save_state(workdir, state):
    with open(_state_path(workdir), "w") as f:
        json.dump(state, f, indent=2)


def _index_path(workdir):
    return os.path.join(workdir, "dejavu_index.npz")


def _ingest_program(num_samples, max_peaks):
    import jax
    import jax.numpy as jnp

    from musicfpaugment_tpu.afp.audfprint.landmarks import compact_valid_first
    from musicfpaugment_tpu.afp.dejavu.fingerprint import (
        fingerprint_spectrogram_batch,
        pack_hashes_from_masks,
    )
    from musicfpaugment_tpu.data.synthetic import synth_tracks_device

    def prog(corpus_key, indices):
        wavs = synth_tracks_device(corpus_key, indices, num_samples, SR)
        _, masks, _ = fingerprint_spectrogram_batch(wavs, SR, 512, 256, 50.0)
        keys, t1, valid, _kf, n_distinct, n_po = pack_hashes_from_masks(
            masks, max_peaks
        )
        k, t, nv = compact_valid_first(keys, t1, valid, out_len=HCAP)
        return (
            jnp.stack([k, t], axis=-1),
            jnp.minimum(nv, HCAP),
            jnp.sum(nv > HCAP) + n_po,
        )

    return jax.jit(prog)


def stage_ingest(args):
    import jax

    from musicfpaugment_tpu.afp.dejavu import DejavuDeviceIndex

    os.makedirs(args.workdir, exist_ok=True)
    state = _load_state(args.workdir)
    start = state.get("next_track", 0)
    if start >= args.tracks:
        print("ingest complete:", start, "tracks", flush=True)
        return
    if os.path.exists(_index_path(args.workdir)):
        idx = DejavuDeviceIndex.load(_index_path(args.workdir))
        assert len(idx.names) == start, (len(idx.names), start)
    else:
        idx = DejavuDeviceIndex(max_rows_per_hash=args.hash_cap)
    n_frames = 1 + (TRACK_SECONDS * SR - 512) // 256
    max_peaks = -(-4 * n_frames // 128) * 128
    prog = _ingest_program(TRACK_SECONDS * SR, max_peaks)
    corpus_key = jax.random.PRNGKey(args.corpus_seed)

    deadline = time.time() + args.minutes * 60
    batch_times = state.get("ingest_batch_seconds", [])
    overflow = state.get("hash_overflow", 0)

    def _drain(pending):
        nonlocal overflow
        p_start, p_n, out = pending
        kt, counts, over = jax.device_get(out)
        for j in range(p_n):
            n = int(counts[j])
            idx.names.append(f"t{p_start + j:06d}")
            idx.total_hashes.append(n)
            idx._keys.append(kt[j, :n, 0].astype(np.int32))
            idx._offs.append(kt[j, :n, 1].astype(np.int32))
        overflow += int(over)

    pending = None
    t0 = time.perf_counter()
    while start < args.tracks and time.time() < deadline:
        n = min(args.batch, args.tracks - start)
        idx_arr = np.arange(start, start + args.batch, dtype=np.int32)
        out = prog(corpus_key, idx_arr)
        if pending is not None:
            _drain(pending)
        pending = (start, n, out)
        start += n
        dt = time.perf_counter() - t0
        t0 = time.perf_counter()
        batch_times.append(round(dt, 3))
        if len(batch_times) % 40 == 0 or start >= args.tracks:
            print(
                f"ingested {start}/{args.tracks} "
                f"({args.batch / dt:.1f} tracks/s last batch)",
                flush=True,
            )
    if pending is not None:
        _drain(pending)
    idx._frozen = None
    idx.save(_index_path(args.workdir))
    state.update(
        next_track=start,
        ingest_batch_seconds=batch_times[-200:],
        hash_overflow=overflow,
        tracks_target=args.tracks,
        hash_cap=args.hash_cap,
    )
    if start >= args.tracks:
        total = int(sum(idx.total_hashes))
        steady = np.median(batch_times[5:]) if len(batch_times) > 5 else None
        state.update(
            ingest_done=True,
            total_rows=total,
            ingest_tracks_per_sec=(
                round(args.batch / steady, 1) if steady else None
            ),
        )
        print("ingest complete:", json.dumps(state, indent=2), flush=True)
    _save_state(args.workdir, state)


_BANK_CACHE = {}


def _banks(args):
    """Degradation banks, built once per process (same policy as
    scale_proof.py: ``--banks dcase`` draws from reference-corpus-SHAPED
    pools — scene-structured noise hours + 271 IRs — instead of the toy
    32-row pool; ref augmentation/constants.py:1-25)."""
    from musicfpaugment_tpu import augment

    key = (args.banks, round(args.bank_hours, 3))
    if key not in _BANK_CACHE:
        if args.banks == "dcase":
            _BANK_CACHE[key] = augment.dcase_shaped_banks(
                sample_rate=SR, noise_row_length=QUERY_SECONDS * SR,
                hours=args.bank_hours, num_scenes=15, num_irs=271, seed=7,
            )
        else:
            _BANK_CACHE[key] = augment.synthetic_banks(
                sample_rate=SR, noise_row_length=QUERY_SECONDS * SR,
                num_noise=32, num_irs=16,
            )
    return _BANK_CACHE[key]


def _condition_augmenter(name, params, args):
    from musicfpaugment_tpu import augment

    noise_bank, ir_bank = _banks(args)
    fp = augment.AugmentFP(
        noise_bank, SR, parameters=params, impulse_response_dir=ir_bank
    )
    fp.freeze_parameters(42)
    return fp


def _load_denoiser(pkl_path):
    """-> UNet spectrogram-denoiser hook for ``DejavuDeviceMatcher``.

    The reference uses ONE UNet checkpoint for both AFP systems (loaded at
    import in afp/audfprint/peak_extractor.py:24-37 and
    afp/dejavu/fingerprint.py:27-31); here the same ``unet.pkl`` trained by
    ``scale_proof.py train`` serves both — the dejavu frontend applies it to
    the normalized PSD specgram and squares (fingerprint.py:70-75
    semantics, wired inside fingerprint_spectrogram_batch)."""
    import pickle

    from musicfpaugment_tpu.models import UNet

    with open(pkl_path, "rb") as f:
        variables = pickle.load(f)
    model = UNet(1, 1, rate=0.05)

    def hook(sgram):
        return model.apply(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]},
            sgram, train=False,
        )

    return hook


def _make_queries(corpus_key, qidx, offsets):
    import jax
    import jax.numpy as jnp

    from musicfpaugment_tpu.data.synthetic import synth_tracks_device

    def prog(key, tids, offs):
        tracks = synth_tracks_device(key, tids, TRACK_SECONDS * SR, SR)

        def crop(row, off):
            return jax.lax.dynamic_slice_in_dim(row, off, QUERY_SECONDS * SR)

        return jax.vmap(crop)(tracks, offs)

    return jax.jit(prog)(corpus_key, jnp.asarray(qidx), jnp.asarray(offsets))


def _load_matcher(args, state):
    from musicfpaugment_tpu.afp.dejavu import (
        DejavuDeviceIndex,
        DejavuDeviceMatcher,
    )

    t0 = time.perf_counter()
    idx = DejavuDeviceIndex.load(_index_path(args.workdir))
    starts, rows, nbuckets, depth = idx.finalize()
    finalize_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    dm = DejavuDeviceMatcher(idx)
    upload_s = time.perf_counter() - t0
    index_mb = (rows.nbytes + starts.nbytes) / 1e6
    print(
        f"matcher ready: rows={rows.size} depth={depth} "
        f"index={index_mb:.0f}MB (CSR prefix {starts.nbytes / 1e6:.0f}MB) "
        f"hot-key rows dropped={idx.rows_dropped} "
        f"finalize {finalize_s:.1f}s upload {upload_s:.1f}s",
        flush=True,
    )
    state.update(
        total_rows_stored=int(rows.size),
        bucket_depth=int(depth),
        index_mb=round(index_mb, 1),
        rows_dropped=int(idx.rows_dropped),
        finalize_s=round(finalize_s, 1),
        index_upload_s=round(upload_s, 1),
    )
    return idx, dm


def stage_match(args):
    import jax

    from musicfpaugment_tpu.afp.dejavu.variables import MIN_HASHES
    from musicfpaugment_tpu.testing.parameters import (
        test_pipelines_parameters,
    )

    state = _load_state(args.workdir)
    assert state.get("ingest_done"), "run ingest to completion first"
    n_tracks = state["tracks_target"]
    _idx, dm = _load_matcher(args, state)

    # the paper's comparison for the second AFP system too: every query
    # also runs through the UNet-denoised matcher and the mix rule picks
    # whichever variant aligned more hashes (ref: dejavu_exps.py:21-79 on
    # nb_matches_with_offset)
    dm_den = None
    if args.denoise:
        from musicfpaugment_tpu.afp.dejavu import DejavuDeviceMatcher

        hook = _load_denoiser(args.unet_pkl)
        # finalize() is cached on the index, so the second matcher reuses
        # the host CSR and only re-uploads the device arrays (~1 s)
        dm_den = DejavuDeviceMatcher(_idx, spec_denoiser=hook)

    rng = np.random.default_rng(42)
    qidx = rng.integers(0, n_tracks, args.queries).astype(np.int32)
    offsets = rng.integers(
        0, (TRACK_SECONDS - QUERY_SECONDS) * SR, args.queries
    ).astype(np.int32)
    corpus_key = jax.random.PRNGKey(args.corpus_seed)

    conditions = {"cleans": None, **test_pipelines_parameters}
    if args.conditions != "all":
        keep = set(args.conditions.split(","))
        conditions = {k: v for k, v in conditions.items() if k in keep}

    warm = _make_queries(corpus_key, qidx[: args.batch], offsets[: args.batch])
    dm.match_waveforms(warm)
    if dm_den is not None:
        dm_den.match_waveforms(warm)

    results = state.get("conditions", {})
    for cond, params in conditions.items():
        if cond in results and not args.rerun:
            continue
        fp = (
            _condition_augmenter(cond, params, args)
            if params is not None
            else None
        )
        correct = correct_den = correct_mix = n_done = 0
        match_s = match_den_s = 0.0
        t_cond = time.perf_counter()

        def _hit(r, tid):
            return bool(
                r
                and r["nb_matches_with_offset"] > MIN_HASHES
                and r["song_name"].decode() == f"t{tid:06d}"
            )

        for s in range(0, args.queries, args.batch):
            tids = qidx[s : s + args.batch]
            offs = offsets[s : s + args.batch]
            crops = _make_queries(corpus_key, tids, offs)
            if fp is not None:
                crops = fp.batch_augment_indexed(
                    crops[:, None, :], np.arange(s, s + len(tids))
                )[:, 0, :]
            crops.block_until_ready()
            t0 = time.perf_counter()
            res = dm.match_waveforms(crops)
            match_s += time.perf_counter() - t0
            if dm_den is not None:
                t0 = time.perf_counter()
                res_den = dm_den.match_waveforms(crops)
                match_den_s += time.perf_counter() - t0
            else:
                res_den = res
            for r, rd, tid in zip(res, res_den, tids):
                n_done += 1
                if _hit(r, tid):
                    correct += 1
                if dm_den is not None:
                    if _hit(rd, tid):
                        correct_den += 1
                    # mix rule: more offset-aligned matches wins (ref:
                    # dejavu_exps.py:21-79); a None verdict loses to any
                    # real one
                    nm = r["nb_matches_with_offset"] if r else -1
                    nmd = rd["nb_matches_with_offset"] if rd else -1
                    if _hit(r if nm >= nmd else rd, tid):
                        correct_mix += 1
        results[cond] = {
            "accuracy": round(correct / max(n_done, 1), 4),
            "n_queries": n_done,
            "match_qps": round(n_done / match_s, 1),
            "wall_s": round(time.perf_counter() - t_cond, 1),
        }
        if dm_den is not None:
            results[cond].update(
                accuracy_den=round(correct_den / max(n_done, 1), 4),
                accuracy_mix=round(correct_mix / max(n_done, 1), 4),
                match_den_qps=round(n_done / match_den_s, 1),
            )
        print(cond, results[cond], flush=True)
        state["conditions"] = results
        state["match_batch"] = args.batch
        state["match_banks"] = args.banks
        state["match_denoise"] = bool(dm_den is not None)
        _save_state(args.workdir, state)


def _python_align_oracle(starts, rows, timebits, names, query_hashes):
    """Independent reimplementation of return_matches + align_matches
    (ref: postgres_database.py:182-229, dejavu.py:312-378) over the CSR
    rows: per-(sid, dt) counts, per-sid best offset (ties -> smallest dt),
    song ranking by count (ties -> smallest sid), dedup row counts."""
    from collections import defaultdict

    cell = defaultdict(int)
    dedup = defaultdict(int)
    seen_keys = set()
    tmask = (1 << timebits) - 1
    for key, t1 in query_hashes:
        if key + 1 >= len(starts):
            continue  # beyond the stored key space — the device masks too
        r = rows[starts[key] : starts[key + 1]]
        first_key = key not in seen_keys
        seen_keys.add(key)
        for row in r:
            sid = int(row) >> timebits
            off = int(row) & tmask
            cell[(sid, off - t1)] += 1
            if first_key:
                dedup[sid] += 1
    if not cell:
        return None
    per_song = {}
    for (sid, dt), c in sorted(cell.items()):
        best = per_song.get(sid)
        if best is None or c > best[1]:
            per_song[sid] = (dt, c)
    best_sid = max(sorted(per_song), key=lambda s: per_song[s][1])
    dt, c = per_song[best_sid]
    return {
        "song_name": names[best_sid],
        "nb_matches_with_offset": c,
        "hashes_matched": dedup[best_sid],
        "offset": dt,
    }


def stage_oracle(args):
    import jax

    from musicfpaugment_tpu.afp.dejavu.fingerprint import (
        fingerprint_spectrogram_batch,
        pack_hashes,
        peaks_from_mask,
    )
    from musicfpaugment_tpu.testing.parameters import (
        test_pipelines_parameters,
    )

    state = _load_state(args.workdir)
    assert state.get("ingest_done"), "run ingest to completion first"
    idx, dm = _load_matcher(args, state)
    starts, rows, _nb, _d = idx.finalize()
    n_tracks = state["tracks_target"]
    rng = np.random.default_rng(43)
    n = args.oracle_n
    qidx = rng.integers(0, n_tracks, n).astype(np.int32)
    offsets = rng.integers(0, (TRACK_SECONDS - QUERY_SECONDS) * SR, n).astype(
        np.int32
    )
    corpus_key = jax.random.PRNGKey(args.corpus_seed)
    crops = _make_queries(corpus_key, qidx, offsets)
    fp = _condition_augmenter(
        "bn_p10", test_pipelines_parameters["bn_p10"], args
    )
    aug = fp.batch_augment_indexed(crops[:, None, :], np.arange(n))[:, 0, :]

    device_results = dm.match_waveforms(aug)
    _, masks, _ = jax.jit(
        lambda w: fingerprint_spectrogram_batch(w, SR, 512, 256, 50.0)
    )(aug)
    masks = np.asarray(jax.device_get(masks))
    agree = 0
    for i in range(n):
        qh = sorted(set(pack_hashes(peaks_from_mask(masks[i]))))
        ov = _python_align_oracle(starts, rows, idx.timebits, idx.names, qh)
        dv = device_results[i]
        if ov is None:
            same = dv == {}
        else:
            same = (
                bool(dv)
                and dv["song_name"].decode() == ov["song_name"]
                and dv["nb_matches_with_offset"] == ov["nb_matches_with_offset"]
                and dv["hashes_matched_in_input"] == ov["hashes_matched"]
                and dv["offset"] == ov["offset"]
            )
        agree += int(same)
        if not same:
            print("DISAGREE", i, "oracle:", ov, "device:", dv, flush=True)
    state["oracle_agreement"] = f"{agree}/{n}"
    _save_state(args.workdir, state)
    print("oracle agreement:", agree, "/", n, flush=True)


def stage_report(args):
    state = _load_state(args.workdir)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "scale_out", "dejavu_results.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    state.pop("ingest_batch_seconds", None)
    with open(out, "w") as f:
        json.dump(state, f, indent=2)
        f.write("\n")
    print(json.dumps(state, indent=2))
    print("wrote", out)


def main():
    try:
        import jax

        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("MFPA_JAX_CACHE", "/tmp/jaxcache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    p = argparse.ArgumentParser()
    p.add_argument("stage", choices=["ingest", "match", "oracle", "report"])
    p.add_argument("--workdir", default="/tmp/dejavu_scale")
    p.add_argument("--tracks", type=int, default=106574)  # |FMA-large|
    p.add_argument("--queries", type=int, default=1024)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--minutes", type=float, default=8.0)
    p.add_argument("--conditions", default="all")
    p.add_argument("--corpus-seed", type=int, default=1234)
    p.add_argument("--oracle-n", type=int, default=32)
    # Default raised 64 -> 1024 after the cap sweep
    # (scale_out/dejavu_cap_sweep.json): caps that bind cost accuracy about
    # in proportion to rows dropped, and at 106k tracks the max bucket depth
    # is ~530 (50 at 10k, ~linear in corpus size) — 1024 is lossless there
    # while 64 dropped 54% of all rows.
    p.add_argument("--hash-cap", type=int, default=1024)
    p.add_argument("--banks", choices=["toy", "dcase"], default="toy")
    p.add_argument("--bank-hours", type=float, default=2.0)
    p.add_argument("--denoise", action="store_true",
                   help="also run the UNet-denoised matcher + mix rule "
                        "(nb_matches_with_offset; ref dejavu_exps.py:21-79)")
    p.add_argument("--unet-pkl", default="/tmp/scale_proof/unet.pkl",
                   help="UNet params trained by scale_proof.py train — the "
                        "reference shares one checkpoint across both AFP "
                        "systems")
    p.add_argument("--rerun", action="store_true")
    args = p.parse_args()
    dict(
        ingest=stage_ingest, match=stage_match,
        oracle=stage_oracle, report=stage_report,
    )[args.stage](args)


if __name__ == "__main__":
    main()
