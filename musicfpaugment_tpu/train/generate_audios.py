"""Denoising-demo CLI: augment a clip, denoise it, dump wav/png triplets
(ref: training/generate_audios.py:1-106).

Loads the best checkpoint for the chosen model, augments a random validation
clip (or a synthetic one when datasets are absent), runs the denoiser, and
writes clean/augmented/denoised wavs plus spectrogram figures.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from musicfpaugment_tpu.augment.pipeline import synthetic_banks, AugmentFP
from musicfpaugment_tpu.models import Demucs, UNet
from musicfpaugment_tpu.train import parameters as P
from musicfpaugment_tpu.train.trainer import spectrogram_batch


def _write_wav(path: str, audio: np.ndarray, sr: int) -> None:
    import scipy.io.wavfile

    scipy.io.wavfile.write(
        path, sr, (np.clip(audio, -1, 1) * 32767).astype(np.int16)
    )


def load_checkpoint_params(ckpt_path: str, which: str = "best_epoch"):
    """Restore saved params from a Trainer checkpoint directory."""
    import orbax.checkpoint as ocp

    path = os.path.join(os.path.abspath(ckpt_path), which)
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path)
    return restored["params"], restored.get("batch_stats", {})


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="unet", choices=["unet", "demucs"])
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--out", default="generated_audios")
    parser.add_argument("--seconds", type=int, default=3)
    args = parser.parse_args()

    sr = P.WAVEFORM_SAMPLING_RATE
    os.makedirs(args.out, exist_ok=True)

    # clean clip: a validation track when mounted, synthetic otherwise
    try:
        from musicfpaugment_tpu.data.jamendo import get_jamendo_data
        from musicfpaugment_tpu.data.dataset import load_track

        _, val_paths = get_jamendo_data(
            os.environ.get("MFPA_JAMENDO_ROOT", "/workspace/mtg-jamendo-dataset/"),
            num_val=64,
        )
        audio = load_track(str(val_paths[0]), sr)
        start = np.random.randint(0, max(1, len(audio) - args.seconds * sr))
        clean = audio[start : start + args.seconds * sr]
    except Exception:
        print("INFO: datasets not mounted — synthesizing a clean clip")
        from musicfpaugment_tpu.data.synthetic import synthetic_clean_batches

        clean = next(synthetic_clean_batches(1, args.seconds * sr, sr))[0]

    noise_bank, ir_bank = synthetic_banks(
        sample_rate=sr, noise_row_length=args.seconds * sr
    )
    augmenter = AugmentFP(noise_bank, sr, impulse_response_dir=ir_bank)
    augmented = np.asarray(augmenter(clean[None, :]))[0]

    if args.model == "unet":
        model = UNet(1, 1, rate=0.05)
        lr = 1e-3
    else:
        model = Demucs()
        lr = 5e-4
    ckpt = args.checkpoint or os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "checkpoints",
        f"{args.model}_lr_{lr}_BS_{P.BATCH_SIZE}",
    )
    try:
        params, batch_stats = load_checkpoint_params(ckpt)
        variables = {"params": params, "batch_stats": batch_stats}
    except Exception:
        print(f"INFO: no checkpoint at {ckpt} — using random init")
        if args.model == "unet":
            variables = model.init(
                jax.random.PRNGKey(0), spectrogram_batch(jnp.asarray(clean[None]))
            )
        else:
            variables = model.init(jax.random.PRNGKey(0), jnp.asarray(clean[None]))

    if args.model == "unet":
        aug_spec = spectrogram_batch(jnp.asarray(augmented[None]))
        den_spec = np.asarray(model.apply(variables, aug_spec))[0]
        denoised = None
    else:
        denoised = np.asarray(model.apply(variables, jnp.asarray(augmented[None])))[0]
        den_spec = np.asarray(
            spectrogram_batch(jnp.asarray(denoised[None]))
        )[0]

    _write_wav(os.path.join(args.out, "clean.wav"), clean, sr)
    _write_wav(os.path.join(args.out, "augmented.wav"), augmented, sr)
    if denoised is not None:
        _write_wav(os.path.join(args.out, "denoised.wav"), denoised, sr)
    try:
        from musicfpaugment_tpu.train.visualisation import plot_spectrogram

        for name, sig in [("clean", clean), ("augmented", augmented)]:
            spec = np.asarray(spectrogram_batch(jnp.asarray(sig[None])))[0]
            plot_spectrogram(spec, os.path.join(args.out, f"{name}.png"), amplitude=True)
        plot_spectrogram(
            den_spec, os.path.join(args.out, "denoised.png"), amplitude=True
        )
    except ImportError:
        print("INFO: matplotlib not available — skipping figures")
    print(f"Wrote triplets to {args.out}/")


if __name__ == "__main__":
    main()
