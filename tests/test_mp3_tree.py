"""mp3-tree end-to-end smoke (VERDICT r2 #9): a jamendo-style mp3 corpus
flows through the real loaders — TSV split parsing, threaded mp3 decode +
segmentation, a denoiser train epoch, and AFP identification — exercising
the same path the reference runs over MTG-Jamendo/FMA
(ref: training/dataset.py:20-65, training/jamendo.py:34-197)."""

from __future__ import annotations

import os

import numpy as np
import pytest

from musicfpaugment_tpu.data import mp3_encode
from musicfpaugment_tpu.data.native import available as native_available
from musicfpaugment_tpu.data.native import mp3_available

SR = 22050  # encode rate; loaders resample to 8 kHz
NEED_MP3 = not (
    mp3_encode.available() and native_available() and mp3_available()
)


def _make_jamendo_tree(root, rng, n_tracks=6, seconds=6):
    """Write a minimal MTG-Jamendo layout: split TSVs + raw_30s/audio mp3s."""
    audio_dir = os.path.join(root, "raw_30s", "audio", "00")
    split_dir = os.path.join(root, "data", "splits", "split-0")
    os.makedirs(audio_dir, exist_ok=True)
    os.makedirs(split_dir, exist_ok=True)

    paths = []
    rows = []
    t = np.arange(seconds * SR) / SR
    for i in range(n_tracks):
        x = np.zeros(len(t), np.float32)
        for _ in range(seconds * 20):
            f = rng.uniform(100, 3000)
            s = int(rng.integers(0, len(t) - SR // 8))
            d = int(rng.integers(SR // 16, SR // 4))
            seg = np.arange(min(d, len(t) - s))
            x[s : s + len(seg)] += (
                np.sin(2 * np.pi * f * seg / SR) * np.exp(-8 * seg / SR)
            ).astype(np.float32)
        x /= max(np.abs(x).max(), 1e-9)
        rel = f"00/{1000 + i}.mp3"
        path = os.path.join(root, "raw_30s", "audio", rel)
        mp3_encode.encode_mp3(x, path, SR)
        paths.append(path)
        rows.append(
            f"track_{1000 + i:07d}\tartist_{i:06d}\talbum_{i:06d}\t{rel}"
            f"\t{float(seconds)}\tgenre---ambient"
        )

    header = "TRACK_ID\tARTIST_ID\tALBUM_ID\tPATH\tDURATION\tTAGS"
    splits = {
        "autotagging-train.tsv": rows[:3],
        "autotagging-validation.tsv": rows[3:5],
        "autotagging-test.tsv": rows[5:],
    }
    for name, rws in splits.items():
        with open(os.path.join(split_dir, name), "w") as f:
            f.write("\n".join([header] + rws) + "\n")
    return paths


@pytest.mark.slow
@pytest.mark.skipif(NEED_MP3, reason="libmp3lame/libmpg123 unavailable")
def test_mp3_tree_train_and_identify(tmp_path, rng):
    import jax

    from musicfpaugment_tpu import augment
    from musicfpaugment_tpu.afp.audfprint import AudfprintPeaks
    from musicfpaugment_tpu.data.jamendo import get_data_loaders
    from musicfpaugment_tpu.models import UNet
    from musicfpaugment_tpu.testing.audfprint_exps import (
        compute_accuracy_batched,
        create_fp_database,
    )
    from musicfpaugment_tpu.testing.parameters import afp_settings
    from musicfpaugment_tpu.train.trainer import Trainer

    root = str(tmp_path / "jamendo")
    paths = _make_jamendo_tree(root, rng)

    # --- loaders: TSV split -> threaded mp3 decode -> 8 kHz segments
    train_iter, val_iter = get_data_loaders(
        model_duration_seconds=1.0,
        val_steps=1,
        batch_size=2,
        dataset_path=root,
    )
    batch = next(train_iter)
    assert batch.shape == (2, 8000)
    assert np.isfinite(batch).all() and np.abs(batch).max() > 0

    # --- one tiny denoiser epoch over the decoded mp3 stream
    noise_bank, ir_bank = augment.synthetic_banks(
        sample_rate=8000, noise_row_length=8000, num_noise=4, num_irs=2
    )
    augmenter = augment.AugmentFP(
        noise_bank, 8000, impulse_response_dir=ir_bank
    )
    trainer = Trainer(
        model=UNet(1, 1, rate=0.05, base=8),
        train_iter=train_iter,
        train_steps=2,
        val_iter=val_iter,
        val_steps=1,
        learning_rate=1e-3,
        nb_epochs=1,
        checkpoint=str(tmp_path / "ckpt"),
        input_type="spec",
        augmenter=augmenter,
        example_batch=batch,
    )
    losses = trainer.train_epoch(1)
    assert np.isfinite(losses["loss"])

    # --- AFP over the mp3 tree: bulk index, then identify clean crops
    ht = create_fp_database(paths, str(tmp_path / "db.npz"), batch_size=3)
    analyzer = AudfprintPeaks(afp_settings["audfprint"])
    qdir = tmp_path / "queries"
    os.makedirs(qdir)
    import scipy.io.wavfile

    r = np.random.default_rng(0)
    for p in paths[:4]:
        w = analyzer._load(p)
        start = int(r.integers(0, len(w) - 2 * 8000))
        name = os.path.basename(p).split(".")[0]
        scipy.io.wavfile.write(
            str(qdir / f"{name}.wav"), 8000,
            (w[start : start + 2 * 8000] * 32000).astype(np.int16),
        )
    queries = [str(qdir / q) for q in sorted(os.listdir(qdir))]
    acc = compute_accuracy_batched(queries, ht, analyzer, batch_size=4)
    # ground truth name is the mp3 path; verdict name must end in <id>.mp3
    # compute_accuracy_batched compares basenames, so exact-match accuracy:
    assert acc["No Denoising"] >= 0.75
