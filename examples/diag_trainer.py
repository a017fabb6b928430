"""Diagnose the demo failure through the actual Trainer class (the
standalone loop in diag_unet.py converges at every scale — isolate what the
Trainer does differently)."""
from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from musicfpaugment_tpu import augment
from musicfpaugment_tpu.data.synthetic import synthetic_clean_batches
from musicfpaugment_tpu.models import UNet
from musicfpaugment_tpu.train.trainer import Trainer

SR = 8000
BATCH = int(os.environ.get("DIAG_BATCH", 32))
BASE = int(os.environ.get("DIAG_BASE", 16))

noise_bank, ir_bank = augment.synthetic_banks(
    sample_rate=SR, noise_row_length=8 * SR, num_noise=24, num_irs=12
)
augmenter = augment.AugmentFP(noise_bank, SR, impulse_response_dir=ir_bank)

with tempfile.TemporaryDirectory() as ckpt:
    trainer = Trainer(
        model=UNet(1, 1, rate=0.05, base=BASE),
        train_iter=synthetic_clean_batches(BATCH, 3 * SR, SR, seed=11),
        train_steps=16,
        val_iter=synthetic_clean_batches(BATCH, 3 * SR, SR, seed=12),
        val_steps=4,
        learning_rate=1e-3,
        nb_epochs=9,
        checkpoint=ckpt,
        input_type="spec",
        augmenter=augmenter,
        example_batch=next(synthetic_clean_batches(BATCH, 3 * SR, SR)),
    )
    trainer.start_epoch()
    trainer.training_loop()
    print([round(h["val"]["loss"], 4) for h in trainer.history])
