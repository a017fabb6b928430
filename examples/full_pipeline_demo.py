"""End-to-end system demo on real hardware, mini scale.

Exercises every layer of the framework exactly like the paper pipeline
(SURVEY.md data-flow spine) without the external datasets:

  synthetic corpus -> noise/IR banks -> UNet denoiser training (on-device
  AugmentFP augmentation inside the jitted step) -> clean + augmented query
  generation (frozen seed 42) -> audfprint indexing -> identification rate
  (no-denoise / denoise / mix) + peak P/R/F1 + PSNR -> results JSONs.

Run:  python examples/full_pipeline_demo.py [--tracks 48] [--epochs 8]
Outputs land in examples/demo_out/ (results JSONs + a summary).
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from musicfpaugment_tpu import augment
from musicfpaugment_tpu.afp.audfprint import AudfprintPeaks, HashTable
from musicfpaugment_tpu.data.synthetic import synthetic_clean_batches
from musicfpaugment_tpu.models import Demucs, UNet
from musicfpaugment_tpu.testing.audfprint_exps import (
    compute_accuracy_batched,
    compute_peaks_metrics,
)
from musicfpaugment_tpu.testing.generate_queries import generate_augmented_queries
from musicfpaugment_tpu.testing.parameters import (
    afp_settings,
    test_pipelines_parameters,
)
from musicfpaugment_tpu.train.trainer import Trainer, spectrogram_batch

SR = 8000


def make_corpus(n_tracks: int, seconds: int = 12, seed: int = 7):
    gen = synthetic_clean_batches(1, seconds * SR, SR, seed=seed)
    return np.stack([next(gen)[0] for _ in range(n_tracks)])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tracks", type=int, default=48)
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--queries", type=int, default=48)
    ap.add_argument("--conditions", nargs="*", default=["bn_0", "full_hard", "reverb"])
    ap.add_argument("--model", choices=["unet", "demucs"], default="unet")
    ap.add_argument("--out", default=os.path.join(os.path.dirname(__file__), "demo_out"))
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    t_all = time.time()

    # 1. corpus + banks ----------------------------------------------------
    tracks = make_corpus(args.tracks)
    noise_bank, ir_bank = augment.synthetic_banks(
        sample_rate=SR, noise_row_length=8 * SR, num_noise=24, num_irs=12
    )
    augmenter = augment.AugmentFP(noise_bank, SR, impulse_response_dir=ir_bank)

    # 2. denoiser training (full-size model, on-device augmentation) --------
    # ref trains both families (training/train.py --model=unet|demucs); the
    # UNet denoises magnitude spectrograms, Demucs raw waveforms
    print(f"== training {args.model} ==", flush=True)
    t0 = time.time()
    if args.model == "unet":
        model = UNet(1, 1, rate=0.05)
        input_type, lr = "spec", 1e-3
    else:
        model = Demucs()
        input_type, lr = "audio", 5e-4
    with tempfile.TemporaryDirectory() as ckpt:
        trainer = Trainer(
            model=model,
            train_iter=synthetic_clean_batches(args.batch, 3 * SR, SR, seed=11),
            train_steps=args.steps,
            val_iter=synthetic_clean_batches(args.batch, 3 * SR, SR, seed=12),
            val_steps=4,
            learning_rate=lr,
            nb_epochs=args.epochs + 1,
            checkpoint=ckpt,
            input_type=input_type,
            augmenter=augmenter,
            example_batch=next(synthetic_clean_batches(args.batch, 3 * SR, SR)),
        )
        trainer.start_epoch()
        trainer.training_loop()
        params = jax.device_get(trainer.state.params)
        batch_stats = jax.device_get(dict(trainer.state.batch_stats))
        history = trainer.history
    train_time = time.time() - t0
    losses = [h["val"]["loss"] for h in history]
    print(f"train {train_time:.0f}s; val loss {losses[0]:.4f} -> {losses[-1]:.4f}")

    if args.model == "unet":
        variables = {"params": params, "batch_stats": batch_stats}

        def unet_denoiser(sgram):
            """Spectrogram denoiser hook for the AFP frontends — (B, F, C)
            layout, same as the training frontend (spectrogram_batch)."""
            return model.apply(variables, sgram, train=False)

        denoiser_kwargs = dict(
            denoising=True, denoising_model="unet", spec_denoiser=unet_denoiser
        )
    else:
        demucs_vars = {"params": params}

        def demucs_denoiser(wavs):
            """Waveform denoiser hook (ref: peak_extractor.py:369-377)."""
            return model.apply(demucs_vars, wavs)

        denoiser_kwargs = dict(
            denoising=True, denoising_model="demucs", wave_denoiser=demucs_denoiser
        )

    # 3. queries -------------------------------------------------------------
    print("== generating queries ==", flush=True)
    cleans_dir = os.path.join(args.out, "queries", "cleans")
    shutil.rmtree(os.path.join(args.out, "queries"), ignore_errors=True)
    os.makedirs(cleans_dir, exist_ok=True)
    rng = np.random.default_rng(42)
    # one query per distinct track: query filename stem == indexed track name,
    # matching the reference's gt convention (audfprint_exps.py:44-47)
    q_ids = rng.permutation(args.tracks)[: min(args.queries, args.tracks)]
    for tid in q_ids:
        start = int(rng.integers(0, tracks.shape[1] - 8 * SR))
        crop = tracks[tid, start : start + 8 * SR]
        with open(os.path.join(cleans_dir, f"{tid:04d}.pkl"), "wb") as f:
            pickle.dump(crop.astype(np.float32), f)

    query_paths = {"cleans": cleans_dir}
    for cond in args.conditions:
        params_c = test_pipelines_parameters[cond]
        cond_dir = os.path.join(args.out, "queries", cond)
        cond_augmenter = augment.AugmentFP(
            noise_bank, SR, parameters=params_c, impulse_response_dir=ir_bank
        )
        generate_augmented_queries(
            cond_dir, params_c, save=True, augmenter=cond_augmenter,
            cleans_path=cleans_dir,
        )
        query_paths[cond] = cond_dir

    # 4. index ----------------------------------------------------------------
    print("== indexing ==", flush=True)
    analyzer = AudfprintPeaks(afp_settings["audfprint"])
    ht = HashTable()
    analyzer.ingest_batch(
        ht, [f"{i:04d}" for i in range(args.tracks)], tracks
    )

    # 5. eval -------------------------------------------------------------------
    print("== evaluating ==", flush=True)
    a_plain = AudfprintPeaks(afp_settings["audfprint"])
    a_den = AudfprintPeaks(afp_settings["audfprint"], **denoiser_kwargs)
    results = {
        "model": args.model,
        "train_val_loss": losses,
        "train_seconds": train_time,
    }
    for cond, path in query_paths.items():
        files = [os.path.join(path, q) for q in sorted(os.listdir(path))]
        # ground truth = leading track id in the filename
        acc = compute_accuracy_batched(files, ht, a_plain, a_den, shifts=4)
        # gt convention: filename stem starts with track id
        results[cond] = {"accuracy": acc}
        print(cond, acc, flush=True)
        if cond != "cleans":
            pm = compute_peaks_metrics(
                files[:12], a_plain, a_den, cleans_path=cleans_dir
            )
            results[cond]["peaks"] = pm
            print(cond, "f1 aug/den:", round(pm["f1_score_no_den"], 3),
                  round(pm["f1_den"], 3), flush=True)

    results["total_seconds"] = time.time() - t_all
    name = "results.json" if args.model == "unet" else f"results_{args.model}.json"
    with open(os.path.join(args.out, name), "w") as f:
        json.dump(results, f, indent=2, default=float)
    print(f"== done in {results['total_seconds']:.0f}s -> {args.out}/{name} ==")


if __name__ == "__main__":
    main()
