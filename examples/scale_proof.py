"""Reference-scale identification proof (VERDICT r2 #1).

The reference's headline workload is a 106k-track FMA-large index queried by
10k 8-second crops over 11 augmentation conditions
(ref: testing/fma_preprocessing.py:10-18, testing/parameters.py:3-15). This
script reproduces that *scale* on one TPU chip with a storage-free corpus:
track ``i`` is a pure function of ``fold_in(corpus_key, i)``
(data/synthetic.py synth_tracks_device), so a 106k-track corpus is indexed,
and its queries regenerated, without a single host->device waveform upload.

Stages (each resumable, bounded by --minutes so flaky-tunnel runs can be
re-invoked until done; state lives in --workdir):

  ingest  — generate + peak-extract + hash whole batches on device (one XLA
            program), download each track's compacted hashes (~4 MB/batch),
            vectorized host store with reservoir sampling. Checkpoints the
            table + next-index periodically.
  match   — upload the FULL fixed-depth table (~420 MB — possible only
            because the matcher takes it as a jit *argument*, never a
            closure constant), then run the identification conditions
            through the fused DeviceMatcher; records accuracy + q/s.
  oracle  — spot-check DeviceMatcher verdicts against the numpy Matcher
            oracle at full depth.
  report  — merge everything into results.json.

Run (chunked; reference workload = shifts 4, dcase-shaped banks, denoise
comparison — VERDICT r3 #2/#3/#6):
  python examples/scale_proof.py ingest --tracks 106574 --minutes 8
  ... repeat until "ingest complete" ...
  python examples/scale_proof.py train --banks dcase
  python examples/scale_proof.py match --queries 10000 --shifts 4 \
      --banks dcase --denoise
  python examples/scale_proof.py peaks --queries 10000 --banks dcase --denoise
  python examples/scale_proof.py oracle --shifts 4
  python examples/scale_proof.py report
Demucs variant (the reference's second denoising pipeline):
  python examples/scale_proof.py train --model demucs --banks dcase \
      --train-batch 16
  python examples/scale_proof.py match --queries 10000 --shifts 4 \
      --banks dcase --denoise --denoise-model demucs
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SR = 8000
TRACK_SECONDS = 30
QUERY_SECONDS = 8
HCAP = 4096  # per-track hash budget (30 s @ density 20 yields ~1.4k)


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


def _table_path(workdir):
    return os.path.join(workdir, "table.npz")


def _ingest_program(batch, num_samples):
    """One jitted device program: track indices -> (hashes (B, HCAP, 2),
    counts (B,)) — generation, peak extraction, landmark hashing, dedup,
    valid-first compaction all fused."""
    import jax
    import jax.numpy as jnp

    from musicfpaugment_tpu.afp.audfprint import landmarks as lm
    from musicfpaugment_tpu.afp.audfprint.peaks import find_peaks_batch
    from musicfpaugment_tpu.data.synthetic import synth_tracks_device

    def prog(corpus_key, indices):
        wavs = synth_tracks_device(corpus_key, indices, num_samples, SR)
        masks = find_peaks_batch(wavs)
        C = int(masks.shape[-1])
        max_peaks = -(-5 * C // 128) * 128
        th, v = lm.hashes_from_masks_batched(
            masks, max_peaks=max_peaks, max_hashes=max_peaks * lm.MAXPAIRSPERPEAK
        )
        t, h, v = lm.sort_dedup_hashes(th[..., 0], th[..., 1], v)
        t, h, n = lm.compact_valid_first(t, h, v, out_len=HCAP)
        return (
            jnp.stack([t, h], axis=-1),
            jnp.minimum(n, HCAP),
            jnp.sum(n > HCAP),
        )

    return jax.jit(prog)


def stage_ingest(args):
    import jax

    from musicfpaugment_tpu.afp.audfprint import HashTable

    os.makedirs(args.workdir, exist_ok=True)
    state = _load_state(args.workdir)
    start = state.get("next_track", 0)
    if start >= args.tracks:
        print("ingest complete:", start, "tracks", flush=True)
        return
    if os.path.exists(_table_path(args.workdir)):
        ht = HashTable(_table_path(args.workdir))
    else:
        ht = HashTable()
    prog = _ingest_program(args.batch, TRACK_SECONDS * SR)
    corpus_key = jax.random.PRNGKey(args.corpus_seed)

    deadline = time.time() + args.minutes * 60
    batch_times = state.get("ingest_batch_seconds", [])
    overflow = state.get("hash_overflow", 0)

    def _drain(pending):
        nonlocal overflow
        p_start, p_n, out = pending
        th, counts, over = jax.device_get(out)
        for j in range(p_n):
            ht.store(f"t{p_start + j:06d}", th[j, : counts[j]])
        overflow += int(over)

    # software pipeline: batch k+1 is dispatched (async) before batch k's
    # ~4 MB download + host store, so host work overlaps device compute
    pending = None
    t0 = time.perf_counter()
    while start < args.tracks and time.time() < deadline:
        n = min(args.batch, args.tracks - start)
        idx = np.arange(start, start + args.batch, dtype=np.int32)
        out = prog(corpus_key, idx)
        if pending is not None:
            _drain(pending)
        pending = (start, n, out)
        start += n
        dt = time.perf_counter() - t0
        t0 = time.perf_counter()
        batch_times.append(round(dt, 3))
        if len(batch_times) % 20 == 0 or start >= args.tracks:
            print(
                f"ingested {start}/{args.tracks} "
                f"({args.batch / dt:.1f} tracks/s last batch, "
                f"{ht.totalhashes()} hashes)",
                flush=True,
            )
    if pending is not None:
        _drain(pending)
    ht.save(_table_path(args.workdir), compress=False)
    state.update(
        next_track=start,
        ingest_batch_seconds=batch_times[-200:],
        hash_overflow=overflow,
        tracks_target=args.tracks,
    )
    if start >= args.tracks:
        stored = int(np.sum(np.minimum(ht.depth, ht.counts)))
        total = ht.totalhashes()
        steady = np.median(batch_times[5:]) if len(batch_times) > 5 else None
        state.update(
            ingest_done=True,
            total_hashes=total,
            stored_hashes=stored,
            reservoir_dropped_pct=round(100.0 * (total - stored) / total, 3),
            buckets_at_depth=int(np.sum(ht.counts >= ht.depth)),
            buckets_over_depth=int(np.sum(ht.counts > ht.depth)),
            max_bucket_count=int(ht.counts.max()),
            ingest_tracks_per_sec=round(args.batch / steady, 1) if steady else None,
        )
        print("ingest complete:", json.dumps(state, indent=2), flush=True)
    _save_state(args.workdir, state)


_BANK_CACHE = {}


def _banks(args):
    """Degradation banks, built once per process and reused across every
    condition (the dcase-shaped noise bank is ~hours of audio — hundreds of
    MB host-side — and uploads to HBM once via the AugmentFP jit arguments).

    ``--banks dcase`` (VERDICT r3 #6) matches the reference corpus *shape*:
    15 scene-structured noise timbres totalling --bank-hours of audio and a
    271-IR reverb pool (ref: augmentation/constants.py:1-25,
    training/background_noise.py:51-108); ``--banks toy`` keeps the round-3
    32-row/16-IR pool for continuity with the r3 artifacts.
    """
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


def stage_train(args):
    """Train the denoiser used by ``match --denoise`` (VERDICT r3 #2: the
    paper's no-denoise/denoise/mix comparison has to run at reference scale,
    which needs a trained model — ref training/train.py and
    testing/audfprint_exps.py:160-185). ``--model unet`` trains the
    spectrogram denoiser (workdir/unet.pkl); ``--model demucs`` the waveform
    denoiser the reference's second pipeline uses
    (ref: afp/audfprint/peak_extractor.py:369-377, workdir/demucs.pkl).
    Synthetic clean batches, the same banks as the match conditions,
    on-device augmentation inside the jitted step."""
    import pickle
    import tempfile

    import jax

    from musicfpaugment_tpu import augment
    from musicfpaugment_tpu.data.synthetic import synthetic_clean_batches
    from musicfpaugment_tpu.models import Demucs, UNet
    from musicfpaugment_tpu.train.trainer import Trainer

    os.makedirs(args.workdir, exist_ok=True)
    noise_bank, ir_bank = _banks(args)
    augmenter = augment.AugmentFP(noise_bank, SR, impulse_response_dir=ir_bank)
    if args.model == "unet":
        model, input_type = UNet(1, 1, rate=0.05), "spec"
    else:
        model, input_type = Demucs(), "audio"  # reference defaults (h48 d5)
    t0 = time.time()
    with tempfile.TemporaryDirectory() as ckpt:
        trainer = Trainer(
            model=model,
            train_iter=synthetic_clean_batches(args.train_batch, 3 * SR, SR, seed=11),
            train_steps=args.train_steps,
            val_iter=synthetic_clean_batches(args.train_batch, 3 * SR, SR, seed=12),
            val_steps=4,
            learning_rate=1e-3,
            nb_epochs=args.train_epochs + 1,
            checkpoint=ckpt,
            input_type=input_type,
            augmenter=augmenter,
            example_batch=next(synthetic_clean_batches(args.train_batch, 3 * SR, SR)),
        )
        trainer.start_epoch()
        trainer.training_loop()
        params = jax.device_get(trainer.state.params)
        variables = {"params": params}
        if args.model == "unet":  # Demucs has no BN running stats
            variables["batch_stats"] = jax.device_get(
                dict(trainer.state.batch_stats)
            )
        losses = [float(h["val"]["loss"]) for h in trainer.history]
    with open(os.path.join(args.workdir, f"{args.model}.pkl"), "wb") as f:
        pickle.dump(variables, f)
    state = _load_state(args.workdir)
    key = "denoiser_train" if args.model == "unet" else "denoiser_train_demucs"
    state[key] = {
        "model": args.model,
        "epochs": args.train_epochs,
        "steps_per_epoch": args.train_steps,
        "batch": args.train_batch,
        "banks": args.banks,
        "val_loss": [round(x, 5) for x in losses],
        "train_seconds": round(time.time() - t0, 1),
    }
    _save_state(args.workdir, state)
    print("trained denoiser:", json.dumps(state[key]), flush=True)


def _load_denoiser(workdir, bf16=False):
    """-> spectrogram-denoiser hook for the fused match program, or raises.
    Layout contract: (B, F, C) magnitude spectrograms, the same frontend the
    trainer used (train/trainer.py spectrogram_batch). ``bf16`` runs the
    UNet inference in bfloat16 compute (params stay f32) — the denoised
    match path is UNet-bound, so this trades ~3 decimal digits of
    spectrogram precision for MXU rate; the match stage records its
    accuracy columns separately so the cost is measured, not assumed."""
    import pickle

    import jax.numpy as jnp

    from musicfpaugment_tpu.models import UNet

    with open(os.path.join(workdir, "unet.pkl"), "rb") as f:
        variables = pickle.load(f)
    model = UNet(1, 1, rate=0.05, dtype=jnp.bfloat16 if bf16 else None)

    def hook(sgram):
        out = model.apply(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]},
            sgram, train=False,
        )
        return out.astype(jnp.float32)

    return hook


def _load_wave_denoiser(workdir, bf16=False):
    """-> jitted waveform-denoiser ``(B, T) -> (B, T)`` from
    ``workdir/demucs.pkl`` (train it first: ``train --model demucs``). This
    is the reference's Demucs eval pipeline: queries are denoised as
    *waveforms* before peak extraction
    (ref: afp/audfprint/peak_extractor.py:369-377,
    afp/dejavu/dejavu.py:66-117), so unlike the UNet hook it runs as its own
    device program ahead of the fused matcher."""
    import pickle

    import jax
    import jax.numpy as jnp

    from musicfpaugment_tpu.models import Demucs

    with open(os.path.join(workdir, "demucs.pkl"), "rb") as f:
        variables = pickle.load(f)
    model = Demucs(dtype=jnp.bfloat16 if bf16 else None)

    @jax.jit
    def hook(wavs):
        return model.apply(
            {"params": variables["params"]}, wavs
        ).astype(jnp.float32)

    return hook


def _make_queries(corpus_key, qidx, offsets, batch):
    """Clean 8 s crops of the indexed tracks, generated on device."""
    import jax
    import jax.numpy as jnp

    from musicfpaugment_tpu.data.synthetic import synth_tracks_device

    def prog(key, tids, offs):
        tracks = synth_tracks_device(key, tids, TRACK_SECONDS * SR, SR)

        def crop(row, off):
            return jax.lax.dynamic_slice_in_dim(row, off, QUERY_SECONDS * SR)

        return jax.vmap(crop)(tracks, offs)

    return jax.jit(prog)(corpus_key, jnp.asarray(qidx), jnp.asarray(offsets))


def stage_match(args):
    import jax

    from musicfpaugment_tpu.afp.audfprint import DeviceMatcher, HashTable
    from musicfpaugment_tpu.testing.parameters import test_pipelines_parameters

    state = _load_state(args.workdir)
    assert state.get("ingest_done"), "run ingest to completion first"
    ht = HashTable(_table_path(args.workdir))
    n_tracks = state["tracks_target"]

    t0 = time.perf_counter()
    dm = DeviceMatcher(ht)
    upload_s = time.perf_counter() - t0
    table_mb = dm._table.size * 4 / 1e6
    print(
        f"matcher ready: eff_depth={dm.eff_depth} table={table_mb:.0f}MB "
        f"upload+prep {upload_s:.1f}s",
        flush=True,
    )

    rng = np.random.default_rng(42)
    qidx = rng.integers(0, n_tracks, args.queries).astype(np.int32)
    offsets = rng.integers(
        0, TRACK_SECONDS * SR - QUERY_SECONDS * SR, args.queries
    ).astype(np.int32)
    corpus_key = jax.random.PRNGKey(args.corpus_seed)

    conditions = {"cleans": None, **test_pipelines_parameters}
    if args.conditions != "all":
        keep = set(args.conditions.split(","))
        conditions = {k: v for k, v in conditions.items() if k in keep}

    # the paper's core comparison (VERDICT r3 #2): every query also runs
    # through the denoised analyzer, and the mix rule picks whichever
    # variant aligned more hashes (ref: testing/audfprint_exps.py:160-185).
    # --denoise-model unet fuses the spectrogram hook into the match
    # program; --denoise-model demucs denoises query *waveforms* first, the
    # reference's second eval pipeline (peak_extractor.py:369-377).
    denoiser = wave_den = None
    if args.denoise:
        if args.denoise_model == "demucs":
            wave_den = _load_wave_denoiser(args.workdir, bf16=args.denoise_bf16)
        else:
            denoiser = _load_denoiser(args.workdir, bf16=args.denoise_bf16)
    den_active = args.denoise
    # demucs/bf16 denoise reruns merge into the existing per-condition dicts
    # under suffixed keys, so earlier columns survive for side-by-side
    # comparison
    den_sfx = ""
    if den_active:
        den_sfx = ("_demucs" if args.denoise_model == "demucs" else "") + (
            "_bf16" if args.denoise_bf16 else ""
        )

    # warm up the fused program(s) once (the first call pays trace+compile;
    # per-condition numbers should be the steady identification rate)
    warm = _make_queries(corpus_key, qidx[: args.batch], offsets[: args.batch],
                         args.batch)
    dm.match_waveforms(warm, shifts=args.shifts)
    if denoiser is not None:
        dm.match_waveforms(warm, shifts=args.shifts, denoiser=denoiser)
    if wave_den is not None:
        dm.match_waveforms(wave_den(warm), shifts=args.shifts)

    results = state.get("conditions", {})
    for cond, params in conditions.items():
        done_key = ("accuracy_den" + den_sfx) if den_active else "accuracy"
        if cond in results and done_key in results[cond] and not args.rerun:
            continue
        fp = (
            _condition_augmenter(cond, params, args)
            if params is not None else None
        )
        correct = correct_den = correct_mix = n_done = 0
        match_s = match_den_s = 0.0
        t_cond = time.perf_counter()
        for s in range(0, args.queries, args.batch):
            tids = qidx[s : s + args.batch]
            offs = offsets[s : s + args.batch]
            crops = _make_queries(corpus_key, tids, offs, args.batch)
            if fp is not None:
                crops = fp.batch_augment_indexed(
                    crops[:, None, :], np.arange(s, s + len(tids))
                )[:, 0, :]
            # synchronize: augmentation dispatch is async, so without this
            # the match timer absorbs the augment compute too
            crops.block_until_ready()
            t0 = time.perf_counter()
            verdicts = dm.match_waveforms(crops, shifts=args.shifts)
            match_s += time.perf_counter() - t0
            if denoiser is not None:
                t0 = time.perf_counter()
                verd_den = dm.match_waveforms(
                    crops, shifts=args.shifts, denoiser=denoiser
                )
                match_den_s += time.perf_counter() - t0
            elif wave_den is not None:
                # the Demucs pass is part of the denoised pipeline's cost,
                # so the timer wraps denoise + match together
                t0 = time.perf_counter()
                verd_den = dm.match_waveforms(
                    wave_den(crops), shifts=args.shifts
                )
                match_den_s += time.perf_counter() - t0
            else:
                verd_den = verdicts
            for v, vd, tid in zip(verdicts, verd_den, tids):
                n_done += 1
                gt = f"t{tid:06d}"
                if v[0] == "MATCH" and v[1] == gt:
                    correct += 1
                if den_active:
                    if vd[0] == "MATCH" and vd[1] == gt:
                        correct_den += 1
                    # mix rule: more aligned hashes wins (ref:
                    # audfprint_exps.py:74-80)
                    best = v if v[2] >= vd[2] else vd
                    if best[0] == "MATCH" and best[1] == gt:
                        correct_mix += 1
        results[cond] = {
            **results.get(cond, {}),
            "accuracy": round(correct / max(n_done, 1), 4),
            "n_queries": n_done,
            "match_qps": round(n_done / match_s, 1),
            "wall_s": round(time.perf_counter() - t_cond, 1),
        }
        if den_active:
            results[cond].update({
                "accuracy_den" + den_sfx:
                    round(correct_den / max(n_done, 1), 4),
                "accuracy_mix" + den_sfx:
                    round(correct_mix / max(n_done, 1), 4),
                "match_den" + den_sfx + "_qps":
                    round(n_done / match_den_s, 1),
            })
        print(cond, results[cond], flush=True)
        state["conditions"] = results
        state.update(
            eff_depth=int(dm.eff_depth),
            table_mb=round(table_mb, 1),
            table_upload_s=round(upload_s, 1),
            match_batch=args.batch,
            match_shifts=args.shifts,
            match_banks=args.banks,
            match_denoise=bool(den_active),
        )
        if den_active:
            state["match_denoise_model"] = args.denoise_model
        _save_state(args.workdir, state)


def stage_peaks(args):
    """Peak P/R/F1 + spectrogram PSNR at the reference's full query count
    (VERDICT r4 #8: the paper's table runs its metrics over the whole query
    set, ref testing/audfprint_exps.py:86-157). For every condition the
    same 10k crops the match stage identifies are scored against their
    clean versions: peak masks from ``find_peaks_batch``, spectrograms from
    ``spectrogram_frontend``, both with and (``--denoise``) without the
    UNet hook — whole batches in one XLA program, sums accumulated on
    device so only scalars ride the tunnel."""
    import jax
    import jax.numpy as jnp

    from musicfpaugment_tpu.afp.audfprint.peaks import (
        find_peaks_batch,
        spectrogram_frontend,
    )
    from musicfpaugment_tpu.testing.metrics import batch_peak_metrics, batch_psnr
    from musicfpaugment_tpu.testing.parameters import test_pipelines_parameters

    state = _load_state(args.workdir)
    assert state.get("ingest_done"), "run ingest to completion first"
    n_tracks = state["tracks_target"]
    denoiser = _load_denoiser(args.workdir, bf16=args.denoise_bf16) \
        if args.denoise else None

    rng = np.random.default_rng(42)  # same crops the match stage identified
    qidx = rng.integers(0, n_tracks, args.queries).astype(np.int32)
    offsets = rng.integers(
        0, TRACK_SECONDS * SR - QUERY_SECONDS * SR, args.queries
    ).astype(np.int32)
    corpus_key = jax.random.PRNGKey(args.corpus_seed)

    conditions = dict(test_pipelines_parameters)
    if args.conditions != "all":
        keep = set(args.conditions.split(","))
        conditions = {k: v for k, v in conditions.items() if k in keep}

    jit_cache = {}

    def masks_sgrams_sums(wavs, hook):
        """(B, T) -> per-batch (masks, sgram) — one program per hook."""
        key = id(hook)
        if key not in jit_cache:
            def fn(wv):
                masks = find_peaks_batch(wv, denoiser=hook)
                sgram = spectrogram_frontend(wv, 512, 256, hook)
                return masks, sgram

            jit_cache[key] = jax.jit(fn)
        return jit_cache[key](wavs)

    @jax.jit
    def score(m_pred, m_clean, sg_pred, sg_clean):
        pm = batch_peak_metrics(m_pred, m_clean, reduce=False)
        return (jnp.sum(pm["precision"]), jnp.sum(pm["recall"]),
                jnp.sum(pm["f1"]), jnp.sum(batch_psnr(sg_pred, sg_clean)))

    results = state.get("conditions", {})
    for cond, params in conditions.items():
        if (
            cond in results
            and "peaks_f1" in results.get(cond, {})
            and not args.rerun
        ):
            continue
        fp = _condition_augmenter(cond, params, args)
        sums = np.zeros(4)
        sums_den = np.zeros(4)
        n_done = 0
        t_cond = time.perf_counter()
        for s in range(0, args.queries, args.batch):
            tids = qidx[s : s + args.batch]
            offs = offsets[s : s + args.batch]
            cleans = _make_queries(corpus_key, tids, offs, args.batch)
            aug = fp.batch_augment_indexed(
                cleans[:, None, :], np.arange(s, s + len(tids))
            )[:, 0, :]
            m_clean, sg_clean = masks_sgrams_sums(cleans, None)
            m_aug, sg_aug = masks_sgrams_sums(aug, None)
            sums += np.asarray(
                jax.device_get(score(m_aug, m_clean, sg_aug, sg_clean))
            )
            if denoiser is not None:
                m_den, sg_den = masks_sgrams_sums(aug, denoiser)
                sums_den += np.asarray(
                    jax.device_get(score(m_den, m_clean, sg_den, sg_clean))
                )
            n_done += len(tids)
        cols = dict(zip(
            ("peaks_precision", "peaks_recall", "peaks_f1", "psnr_spec"),
            (round(float(x) / n_done, 4) for x in sums),
        ))
        if denoiser is not None:
            cols.update(zip(
                ("peaks_precision_den", "peaks_recall_den", "peaks_f1_den",
                 "psnr_spec_den"),
                (round(float(x) / n_done, 4) for x in sums_den),
            ))
        cols["peaks_n_queries"] = n_done
        cols["peaks_wall_s"] = round(time.perf_counter() - t_cond, 1)
        results[cond] = {**results.get(cond, {}), **cols}
        print(cond, cols, flush=True)
        state["conditions"] = results
        _save_state(args.workdir, state)


def stage_oracle(args):
    import jax

    from musicfpaugment_tpu.afp.audfprint import (
        AudfprintPeaks, DeviceMatcher, HashTable, Matcher,
    )
    from musicfpaugment_tpu.testing.parameters import (
        afp_settings, test_pipelines_parameters,
    )

    state = _load_state(args.workdir)
    assert state.get("ingest_done"), "run ingest to completion first"
    ht = HashTable(_table_path(args.workdir))
    dm = DeviceMatcher(ht)
    n_tracks = state["tracks_target"]
    rng = np.random.default_rng(43)
    n = args.oracle_n
    qidx = rng.integers(0, n_tracks, n).astype(np.int32)
    offsets = rng.integers(0, (TRACK_SECONDS - QUERY_SECONDS) * SR, n).astype(
        np.int32
    )
    corpus_key = jax.random.PRNGKey(args.corpus_seed)
    crops = _make_queries(corpus_key, qidx, offsets, n)
    fp = _condition_augmenter(
        "default_parameters", test_pipelines_parameters["default_parameters"],
        args,
    )
    aug = np.asarray(
        fp.batch_augment_indexed(crops[:, None, :], np.arange(n))
    )[:, 0, :]

    analyzer = AudfprintPeaks(afp_settings["audfprint"])
    hashes = analyzer.hashes_batch(aug, shifts=args.shifts)
    device_verdicts = dm.match_hashes_batch(hashes)
    oracle = Matcher()
    agree = 0
    for i in range(n):
        ov = oracle.hashes_match_to_msgs(ht, hashes[i])
        dv = device_verdicts[i]
        same = ov[0] == dv[0] and (ov[0] != "MATCH" or ov[1] == dv[1])
        agree += int(same)
        if not same:
            print("DISAGREE", i, "oracle:", ov, "device:", dv, flush=True)
    state["oracle_agreement"] = f"{agree}/{n}"
    state["oracle_shifts"] = args.shifts
    _save_state(args.workdir, state)
    print("oracle agreement:", agree, "/", n, flush=True)


def stage_report(args):
    state = _load_state(args.workdir)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "scale_out", "results.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    state.pop("ingest_batch_seconds", None)
    with open(out, "w") as f:
        json.dump(state, f, indent=2)
        f.write("\n")
    print(json.dumps(state, indent=2))
    print("wrote", out)


def main():
    # chunked invocations re-enter python repeatedly; the persistent
    # compilation cache makes restarts pay trace time only (when the
    # backend supports serialized executables — harmless otherwise)
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
    p.add_argument(
        "stage",
        choices=["ingest", "train", "match", "peaks", "oracle", "report"],
    )
    p.add_argument("--workdir", default="/tmp/scale_proof")
    p.add_argument("--tracks", type=int, default=106574)  # |FMA-large|
    p.add_argument("--queries", type=int, default=1024)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--minutes", type=float, default=8.0)
    p.add_argument("--shifts", type=int, default=1)
    p.add_argument("--conditions", default="all")
    p.add_argument("--corpus-seed", type=int, default=1234)
    p.add_argument("--oracle-n", type=int, default=32)
    p.add_argument("--rerun", action="store_true")
    p.add_argument("--banks", choices=["toy", "dcase"], default="toy")
    p.add_argument("--bank-hours", type=float, default=3.0)
    p.add_argument("--denoise", action="store_true",
                   help="also run the denoised analyzer + mix rule "
                        "(train the model first: scale_proof.py train)")
    p.add_argument("--model", choices=["unet", "demucs"], default="unet",
                   help="which denoiser the train stage fits")
    p.add_argument("--denoise-model", choices=["unet", "demucs"],
                   default="unet",
                   help="denoiser the match stage runs: unet = spectrogram "
                        "hook fused into the match program; demucs = "
                        "waveform denoiser ahead of it (the reference's "
                        "second eval pipeline); demucs columns land under "
                        "*_demucs keys")
    p.add_argument("--denoise-bf16", action="store_true",
                   help="run the UNet denoiser inference in bfloat16 "
                        "compute; results merge under *_bf16 keys next to "
                        "the f32 columns")
    p.add_argument("--train-epochs", type=int, default=20)
    p.add_argument("--train-steps", type=int, default=16)
    p.add_argument("--train-batch", type=int, default=32)
    args = p.parse_args()
    dict(
        ingest=stage_ingest, train=stage_train, match=stage_match,
        peaks=stage_peaks, oracle=stage_oracle, report=stage_report,
    )[args.stage](args)


if __name__ == "__main__":
    main()
