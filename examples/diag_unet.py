"""Diagnose the round-1 denoiser failure (VERDICT weak #1).

Trains a small UNet on synthetic music with on-device augmentation, printing
train-mode loss, eval-mode (running-stats) loss, and prediction scale, to
separate optimization divergence from BatchNorm train/eval mismatch.

Run: JAX_PLATFORMS=cpu python examples/diag_unet.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.core import FrozenDict

from musicfpaugment_tpu import augment
from musicfpaugment_tpu.data.synthetic import synthetic_clean_batches
from musicfpaugment_tpu.models import UNet
from musicfpaugment_tpu.train.losses import l1_loss
from musicfpaugment_tpu.core.stft import stft as _stft

SR = 8000
BATCH = int(os.environ.get("DIAG_BATCH", 16))
BASE = int(os.environ.get("DIAG_BASE", 16))
LR = float(os.environ.get("DIAG_LR", 1e-3))
STEPS = int(os.environ.get("DIAG_STEPS", 160))


def spec_global(w):
    mag = jnp.abs(_stft(w, n_fft=512, hop_length=256))
    return mag / jnp.maximum(jnp.max(mag), 1e-30)


def spec_per_example(w):
    mag = jnp.abs(_stft(w, n_fft=512, hop_length=256))
    return mag / jnp.maximum(jnp.max(mag, axis=(-2, -1), keepdims=True), 1e-30)


def run(norm_name, spec_fn, lr=LR):
    noise_bank, ir_bank = augment.synthetic_banks(
        sample_rate=SR, noise_row_length=8 * SR, num_noise=8, num_irs=4
    )
    aug = augment.AugmentFP(noise_bank, SR, impulse_response_dir=ir_bank)
    model = UNet(1, 1, rate=0.05, base=BASE)
    gen = synthetic_clean_batches(BATCH, 3 * SR, SR, seed=11)
    example = jnp.asarray(next(gen))
    variables = model.init(jax.random.PRNGKey(0), spec_fn(example), train=False)
    params, batch_stats = variables["params"], variables.get("batch_stats", FrozenDict())
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, batch_stats, opt_state, clean, key):
        k_aug, k_drop = jax.random.split(key)
        a = aug._chain(k_aug, clean[:, None, :], aug.noise_bank, aug.ir_bank)[:, 0, :]
        ci, ai = spec_fn(clean), spec_fn(a)

        def loss_fn(p):
            pred, mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, ai, train=True,
                mutable=["batch_stats"], rngs={"dropout": k_drop})
            return l1_loss(pred, ci), mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        gnorm = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, loss, gnorm

    @jax.jit
    def eval_step(params, batch_stats, clean, key):
        a = aug._chain(key, clean[:, None, :], aug.noise_bank, aug.ir_bank)[:, 0, :]
        ci, ai = spec_fn(clean), spec_fn(a)
        pred = model.apply({"params": params, "batch_stats": batch_stats}, ai, train=False)
        return l1_loss(pred, ci), jnp.mean(jnp.abs(pred)), jnp.mean(jnp.abs(ci))

    # fixed val batch
    vgen = synthetic_clean_batches(BATCH, 3 * SR, SR, seed=12)
    val_clean = jnp.asarray(next(vgen))
    vkey = jax.random.PRNGKey(99)

    rng = jax.random.PRNGKey(59)
    t0 = time.time()
    for step in range(STEPS):
        rng, k = jax.random.split(rng)
        clean = jnp.asarray(next(gen))
        params, batch_stats, opt_state, loss, gnorm = train_step(
            params, batch_stats, opt_state, clean, k)
        if step % 20 == 0 or step == STEPS - 1:
            vl, pm, cm = eval_step(params, batch_stats, val_clean, vkey)
            print(f"[{norm_name} lr={lr}] step {step:3d} train {float(loss):.4f} "
                  f"gnorm {float(gnorm):8.2f} | eval(run-stats) {float(vl):.4f} "
                  f"|pred| {float(pm):.4f} |target| {float(cm):.4f}", flush=True)
    print(f"[{norm_name}] {time.time()-t0:.0f}s")


if __name__ == "__main__":
    variants = os.environ.get("DIAG_VARIANTS", "global,per,low_lr").split(",")
    if "global" in variants:
        run("global-norm", spec_global)
    if "per" in variants:
        run("per-example", spec_per_example)
    if "low_lr" in variants:
        run("global-norm", spec_global, lr=LR / 10)
