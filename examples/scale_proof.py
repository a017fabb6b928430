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
  python examples/scale_proof.py oracle --shifts 4
  python examples/scale_proof.py report
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
    """Train the UNet spectrogram denoiser used by ``match --denoise``
    (VERDICT r3 #2: the paper's no-denoise/denoise/mix comparison has to run
    at reference scale, which needs a trained model — ref training/train.py
    and testing/audfprint_exps.py:160-185). Synthetic clean batches, the
    same banks as the match conditions, on-device augmentation inside the
    jitted step; params land in ``workdir/unet.pkl``."""
    import pickle
    import tempfile

    import jax

    from musicfpaugment_tpu import augment
    from musicfpaugment_tpu.data.synthetic import synthetic_clean_batches
    from musicfpaugment_tpu.models import UNet
    from musicfpaugment_tpu.train.trainer import Trainer

    os.makedirs(args.workdir, exist_ok=True)
    noise_bank, ir_bank = _banks(args)
    augmenter = augment.AugmentFP(noise_bank, SR, impulse_response_dir=ir_bank)
    model = UNet(1, 1, rate=0.05)
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
            input_type="spec",
            augmenter=augmenter,
            example_batch=next(synthetic_clean_batches(args.train_batch, 3 * SR, SR)),
        )
        trainer.start_epoch()
        trainer.training_loop()
        params = jax.device_get(trainer.state.params)
        batch_stats = jax.device_get(dict(trainer.state.batch_stats))
        losses = [float(h["val"]["loss"]) for h in trainer.history]
    with open(os.path.join(args.workdir, "unet.pkl"), "wb") as f:
        pickle.dump({"params": params, "batch_stats": batch_stats}, f)
    state = _load_state(args.workdir)
    state["denoiser_train"] = {
        "model": "unet",
        "epochs": args.train_epochs,
        "steps_per_epoch": args.train_steps,
        "batch": args.train_batch,
        "banks": args.banks,
        "val_loss": [round(x, 5) for x in losses],
        "train_seconds": round(time.time() - t0, 1),
    }
    _save_state(args.workdir, state)
    print("trained denoiser:", json.dumps(state["denoiser_train"]), flush=True)


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
    # through the UNet-denoised analyzer, and the mix rule picks whichever
    # variant aligned more hashes (ref: testing/audfprint_exps.py:160-185)
    denoiser = (
        _load_denoiser(args.workdir, bf16=args.denoise_bf16)
        if args.denoise
        else None
    )
    # bf16 denoise reruns merge into the existing per-condition dicts under
    # suffixed keys, so the f32 columns survive for side-by-side comparison
    den_sfx = "_bf16" if (args.denoise and args.denoise_bf16) else ""

    # warm up the fused program(s) once (the first call pays trace+compile;
    # per-condition numbers should be the steady identification rate)
    warm = _make_queries(corpus_key, qidx[: args.batch], offsets[: args.batch],
                         args.batch)
    dm.match_waveforms(warm, shifts=args.shifts)
    if denoiser is not None:
        dm.match_waveforms(warm, shifts=args.shifts, denoiser=denoiser)

    results = state.get("conditions", {})
    for cond, params in conditions.items():
        if cond in results and not args.rerun:
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
            else:
                verd_den = verdicts
            for v, vd, tid in zip(verdicts, verd_den, tids):
                n_done += 1
                gt = f"t{tid:06d}"
                if v[0] == "MATCH" and v[1] == gt:
                    correct += 1
                if denoiser is not None:
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
        if denoiser is not None:
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
            match_denoise=bool(denoiser is not None),
        )
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
        "stage", choices=["ingest", "train", "match", "oracle", "report"]
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
                   help="also run the UNet-denoised analyzer + mix rule "
                        "(train the model first: scale_proof.py train)")
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
        oracle=stage_oracle, report=stage_report,
    )[args.stage](args)


if __name__ == "__main__":
    main()
