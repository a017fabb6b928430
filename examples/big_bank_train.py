"""Prove the train step compiles with a realistically sized noise bank
(VERDICT r2 #3 acceptance): the jitted step takes the noise/IR banks as
device-data *arguments*, so a DCASE-scale bank (hundreds of MB) must NOT be
baked into the XLA program — through this image's remote-compile tunnel a
closure-constant bank of this size fails outright (HTTP 413), which makes a
successful compile here the decisive check.

Run: python examples/big_bank_train.py [--mb 256]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--mb", type=int, default=256, help="noise bank size, MB")
    p.add_argument("--batch", type=int, default=32)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from musicfpaugment_tpu import augment
    from musicfpaugment_tpu.data.synthetic import synthetic_clean_batches
    from musicfpaugment_tpu.models import UNet
    from musicfpaugment_tpu.train.trainer import Trainer

    sr = 8000
    n = 3 * sr
    rows = max(1, args.mb * 2**20 // (4 * n))
    rng = np.random.default_rng(0)
    print(f"building a {rows}x{n} noise bank "
          f"({rows * n * 4 / 2**20:.0f} MB)...", flush=True)
    data = rng.standard_normal((rows, n)).astype(np.float32) * 0.1
    bank = augment.build_noise_bank(data, sr, row_length=n)
    _, ir_bank = augment.synthetic_banks(sample_rate=sr, noise_row_length=n)
    augmenter = augment.AugmentFP(bank, sr, impulse_response_dir=ir_bank)

    clean = next(synthetic_clean_batches(args.batch, n, sr))
    with tempfile.TemporaryDirectory() as tmp:
        t0 = time.perf_counter()
        trainer = Trainer(
            model=UNet(1, 1, rate=0.05, base=8),
            train_iter=iter([clean] * 100),
            train_steps=2,
            val_iter=iter([clean] * 100),
            val_steps=1,
            learning_rate=1e-3,
            nb_epochs=1,
            checkpoint=tmp,
            input_type="spec",
            augmenter=augmenter,
            example_batch=clean,
        )
        losses = trainer.train_epoch(1)
        print(
            f"train step with a {args.mb} MB bank argument: OK "
            f"({time.perf_counter() - t0:.1f}s incl. compile, "
            f"loss {losses['loss']:.4f})",
            flush=True,
        )


if __name__ == "__main__":
    main()
