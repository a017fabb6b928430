"""Training CLI: ``python -m musicfpaugment_tpu.train.train --model=unet|demucs``
(parity with ref: training/train.py:615-690).

Data sources resolve in order: MTG-Jamendo + DCASE if mounted (the reference's
datasets), otherwise synthetic clean batches + synthetic noise/IR banks so the
command runs end-to-end anywhere. Augmentation runs on-device inside the
jitted train step (clean-only host batches).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from musicfpaugment_tpu.augment.pipeline import AugmentFP, synthetic_banks
from musicfpaugment_tpu.data.synthetic import synthetic_clean_batches
from musicfpaugment_tpu.models import Demucs, UNet
from musicfpaugment_tpu.train import parameters as P
from musicfpaugment_tpu.train.trainer import (
    EarlyStopping,
    ReduceLROnPlateau,
    Trainer,
)


def fix_random_seeds(seed: int = 59) -> None:
    """ref: training/utils.py:65-73 (np + framework RNG; JAX keys are
    explicit so only numpy global state needs seeding)."""
    np.random.seed(seed)


def build_augmenter(sample_rate: int) -> AugmentFP:
    """DCASE noise + MIT IRs when available; synthetic banks otherwise."""
    try:
        from musicfpaugment_tpu.data.dcase import load_noise_split

        background_paths = load_noise_split("train")
        from musicfpaugment_tpu.augment.constants import IMPULSE_RESPONSE_DIR

        if not os.path.isdir(IMPULSE_RESPONSE_DIR):
            raise FileNotFoundError(IMPULSE_RESPONSE_DIR)
        return AugmentFP(background_paths, sample_rate)
    except (ImportError, FileNotFoundError, OSError):
        print("INFO: datasets not mounted — using synthetic noise/IR banks")
        noise_bank, ir_bank = synthetic_banks(
            sample_rate=sample_rate,
            noise_row_length=P.DURATION * sample_rate,
        )
        return AugmentFP(noise_bank, sample_rate, impulse_response_dir=ir_bank)


def build_data(batch_size: int, sample_rate: int, duration: int):
    """Jamendo loaders when mounted; synthetic batches otherwise."""
    try:
        from musicfpaugment_tpu.data.jamendo import get_data_loaders

        return get_data_loaders(
            batch_size=batch_size, val_steps=P.VAL_STEPS, run_val=P.RUN_VAL
        )
    except (ImportError, FileNotFoundError, OSError):
        print("INFO: MTG-Jamendo not mounted — using synthetic clean batches")
        n = duration * sample_rate
        return (
            synthetic_clean_batches(batch_size, n, sample_rate, seed=59),
            synthetic_clean_batches(batch_size, n, sample_rate, seed=4),
        )


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="unet", choices=["unet", "demucs"])
    parser.add_argument("--epochs", type=int, default=P.NB_EPOCHS)
    parser.add_argument("--batch-size", type=int, default=P.BATCH_SIZE)
    parser.add_argument("--train-steps", type=int, default=P.TRAIN_STEPS)
    parser.add_argument("--val-steps", type=int, default=P.VAL_STEPS)
    parser.add_argument("--save", action="store_true")
    parser.add_argument("--monitoring", action="store_true")
    parser.add_argument("--base", type=int, default=64,
                        help="UNet width scale (64 = reference plan)")
    parser.add_argument("--bf16", action="store_true",
                        help="bf16 mixed-precision compute (f32 params)")
    parser.add_argument(
        "--multihost", action="store_true",
        help="join a multi-host pod (jax.distributed.initialize; "
        "coordinator/process env: JAX_COORDINATOR_ADDRESS, "
        "JAX_NUM_PROCESSES, JAX_PROCESS_ID — auto-discovered on TPU pods). "
        "The data mesh then spans every pod device; run one process per "
        "host with the same CLI args.",
    )
    args = parser.parse_args()

    if args.multihost:
        from musicfpaugment_tpu.parallel.mesh import init_multihost

        pid = init_multihost()
        print(f"multihost: process {pid} joined the pod")

    fix_random_seeds()

    if args.model == "unet":
        import jax.numpy as jnp

        learning_rate = 1e-3
        model = UNet(
            1, 1, rate=0.05, base=args.base,
            dtype=jnp.bfloat16 if args.bf16 else None,
        )
        input_type = "spec"
    else:
        import jax.numpy as jnp

        learning_rate = 5e-4
        model = Demucs(dtype=jnp.bfloat16 if args.bf16 else None)
        input_type = "audio"
    ckpt_name = f"{args.model}_lr_{learning_rate}_BS_{args.batch_size}"
    ckpt_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "checkpoints", ckpt_name
    )

    sr = P.WAVEFORM_SAMPLING_RATE
    train_iter, val_iter = build_data(args.batch_size, sr, P.DURATION)
    augmenter = build_augmenter(sr)
    example = next(train_iter)
    if isinstance(example, tuple):
        example = example[0]

    trainer = Trainer(
        model=model,
        train_iter=train_iter,
        train_steps=args.train_steps,
        val_iter=val_iter,
        val_steps=args.val_steps,
        learning_rate=learning_rate,
        nb_epochs=args.epochs,
        checkpoint=ckpt_path,
        input_type=input_type,
        augmenter=augmenter,
        factor_sc=P.FACTOR_SC,
        factor_mag=P.FACTOR_MAG,
        scheduler=ReduceLROnPlateau(factor=P.FACTOR, patience=P.PATIENCE),
        early_stopping=EarlyStopping(patience=P.EARLY_STOP, min_delta=P.MIN_DELTA),
        save=args.save,
        monitoring=args.monitoring,
        example_batch=np.asarray(example, np.float32),
    )
    trainer.start_epoch()
    trainer.training_loop()


if __name__ == "__main__":
    main()
