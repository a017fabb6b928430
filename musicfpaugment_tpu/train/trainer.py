"""Denoiser training: data-parallel jit step, plateau LR, early stop, orbax.

Counterpart of the reference Trainer (ref: training/train.py:51-612) with the
TPU-first changes:

* the whole step — optional on-device AugmentFP augmentation, spectrogram
  frontend, forward, loss, backward, Adam update — is ONE jitted XLA program,
  sharded over a 1-D ``data`` mesh (batch split over ICI, params replicated,
  gradient psum inserted by the SPMD partitioner). The reference runs
  single-GPU with host-side tf.data augmentation (SURVEY.md §2.6).
* checkpoint/resume uses orbax (best + last, full state incl. optimizer,
  scheduler and early-stopping state — parity with train.py:130-221);
* ReduceLROnPlateau (factor 0.1, patience 10 — training/parameters.py:25-26)
  is reimplemented host-side over ``optax.inject_hyperparams``;
* two input types: ``"spec"`` (UNet: L1 on max-normalized magnitude
  spectrograms, train.py:263-289) and ``"audio"`` (Demucs: L1 + MR-STFT,
  train.py:291-312); validation adds micro-PSNR and steps the scheduler on
  val loss (train.py:462).

Divergence (documented): the reference's epoch loops run ``range(1, steps)``
but divide accumulated losses by ``steps`` (off-by-one); here an epoch runs
exactly ``steps`` steps and averages by ``steps``.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from musicfpaugment_tpu.augment.pipeline import AugmentFP
from musicfpaugment_tpu.core.stft import stft as _stft
from musicfpaugment_tpu.models import Demucs, rescale_params
from musicfpaugment_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated,
)
from musicfpaugment_tpu.train.losses import (
    l1_loss,
    multi_resolution_stft_loss,
    psnr,
)

Array = jnp.ndarray


def spectrogram_batch(waveforms: Array) -> Array:
    """The model frontend: |STFT| / per-example max, n_fft 512 hop 256 —
    matched to audfprint's STFT (ref: training/visualisation.py:13-36).

    Documented divergence: the reference normalizes by the max over the whole
    *batch* (visualisation.py:29), but AFP inference feeds the denoiser
    per-example max-normalized spectrograms (ref: peak_extractor.py:265-269,
    fingerprint.py:70-75; here afp/audfprint/peaks.py spectrogram_frontend).
    Normalizing per example at training time removes that train/inference
    scale mismatch; for batch size 1 (the reference's query path) the two
    definitions coincide.
    """
    mag = jnp.abs(_stft(waveforms, n_fft=512, hop_length=256))
    denom = jnp.max(mag, axis=(-2, -1), keepdims=True)
    return mag / jnp.maximum(denom, jnp.finfo(mag.dtype).tiny)


class EarlyStopping:
    """ref: training/train.py:582-612 (same quirky -inf init)."""

    def __init__(self, patience: int = 5, min_delta: float = 0.0) -> None:
        self.patience = patience
        self.min_delta = min_delta
        self.counter = 0
        self.best_loss = float("-inf")
        self.early_stop = False

    def __call__(self, val_loss: float) -> None:
        if self.best_loss == float("-inf") or self.best_loss - val_loss > self.min_delta:
            self.best_loss = val_loss
            self.counter = 0
        else:
            self.counter += 1
            print(f"INFO: Early stopping counter {self.counter} of {self.patience}")
            if self.counter >= self.patience:
                print("INFO: Early stopping")
                self.early_stop = True

    def state_dict(self) -> Dict[str, Any]:
        return {
            "patience": self.patience,
            "min_delta": self.min_delta,
            "counter": self.counter,
            "best_loss": self.best_loss,
            "early_stop": self.early_stop,
        }

    def load_state_dict(self, d: Dict[str, Any]) -> None:
        self.__dict__.update(d)


class ReduceLROnPlateau:
    """torch.optim.lr_scheduler.ReduceLROnPlateau('min') semantics
    (used at ref train.py:661-666; factor/patience from parameters.py:25-26).
    Produces a multiplicative LR scale consumed via inject_hyperparams."""

    def __init__(
        self,
        factor: float = 0.1,
        patience: int = 10,
        threshold: float = 1e-4,
        min_lr: float = 0.0,
    ) -> None:
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.min_lr = min_lr
        self.best = float("inf")
        self.num_bad_epochs = 0
        self.scale = 1.0

    def step(self, metric: float) -> None:
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.num_bad_epochs > self.patience:
            self.scale = max(self.scale * self.factor, 0.0)
            self.num_bad_epochs = 0
            print(f"INFO: ReduceLROnPlateau — lr scale now {self.scale}")

    def state_dict(self) -> Dict[str, Any]:
        return {
            "factor": self.factor,
            "patience": self.patience,
            "threshold": self.threshold,
            "best": self.best,
            "num_bad_epochs": self.num_bad_epochs,
            "scale": self.scale,
        }

    def load_state_dict(self, d: Dict[str, Any]) -> None:
        self.__dict__.update(d)


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


class Trainer:
    """Training orchestration with checkpoint/resume (ref: train.py:51-243)."""

    def __init__(
        self,
        model: Any,
        train_iter: Iterator,
        train_steps: int,
        val_iter: Iterator,
        val_steps: int,
        learning_rate: float,
        nb_epochs: int,
        checkpoint: str,
        input_type: str = "audio",
        mesh=None,
        augmenter: Optional[AugmentFP] = None,
        factor_sc: float = 0.5,
        factor_mag: float = 0.5,
        scheduler: Optional[ReduceLROnPlateau] = None,
        early_stopping: Optional[EarlyStopping] = None,
        save: bool = False,
        monitoring: bool = False,
        seed: int = 59,
        example_batch: Optional[np.ndarray] = None,
        cache_validation_set: bool = True,
    ) -> None:
        self.model = model
        self.train_iter = train_iter
        self.val_iter = val_iter
        self.train_steps = train_steps
        self.val_steps = val_steps
        self.nb_epochs = nb_epochs
        self.checkpoint = checkpoint
        self.input_type = input_type
        self.augmenter = augmenter
        self.factor_sc = factor_sc
        self.factor_mag = factor_mag
        self.save = save
        self.monitoring = monitoring
        self.mesh = mesh if mesh is not None else make_mesh()
        self.scheduler = scheduler or ReduceLROnPlateau()
        self.early_stopping = early_stopping or EarlyStopping()
        self.base_lr = learning_rate
        self.epoch_start = 1
        self.min_valid_loss = float("inf")
        self.history: list = []
        # Validation-set caching (ref: training/jamendo.py:181-194 caches +
        # warms the val tf.data pipeline so every epoch sees identical val
        # data): the first val_steps batches are materialized once and
        # replayed with *fixed* per-batch augmentation keys, so val loss is a
        # fixed target for the plateau scheduler and early stopping.
        self.cache_validation_set = cache_validation_set
        self._val_cache: Optional[list] = None
        self._val_keys = [
            jax.random.fold_in(jax.random.PRNGKey(seed + 1), i)
            for i in range(val_steps)
        ]

        self.rng = jax.random.PRNGKey(seed)
        self.tx = optax.inject_hyperparams(optax.adam)(
            learning_rate=learning_rate, b1=0.9, b2=0.999
        )

        if example_batch is None:
            raise ValueError("example_batch (clean waveforms (B, T)) is required")
        if example_batch.shape[0] % self.mesh.devices.size != 0:
            # shrink the data mesh so the batch divides it evenly
            usable = self.mesh.devices.size
            while example_batch.shape[0] % usable != 0:
                usable -= 1
            print(
                f"INFO: batch {example_batch.shape[0]} not divisible by "
                f"{self.mesh.devices.size} devices — using a {usable}-device mesh"
            )
            self.mesh = make_mesh(usable)
        self.state = self._init_state(jnp.asarray(example_batch))
        self._compile_steps()
        self._maybe_resume()

    # ------------------------------------------------------------ state

    def _init_state(self, example: Array) -> TrainState:
        key = jax.random.PRNGKey(0)
        if self.input_type == "spec":
            x = spectrogram_batch(example)
            variables = self.model.init(key, x, train=False)
        else:
            variables = self.model.init(key, example)
        params = variables["params"]
        if isinstance(self.model, Demucs):
            params = rescale_params(params, reference=0.1)
        batch_stats = variables.get("batch_stats", FrozenDict())
        opt_state = self.tx.init(params)
        return TrainState(
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
            step=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------ steps

    def _loss_terms(self, params, batch_stats, clean, aug, key, train: bool):
        if self.input_type == "spec":
            clean_in = spectrogram_batch(clean)
            aug_in = spectrogram_batch(aug)
            variables = {"params": params, "batch_stats": batch_stats}
            if train:
                pred, mutated = self.model.apply(
                    variables,
                    aug_in,
                    train=True,
                    mutable=["batch_stats"],
                    rngs={"dropout": key},
                )
                new_stats = mutated["batch_stats"]
            else:
                pred = self.model.apply(variables, aug_in, train=False)
                new_stats = batch_stats
            loss = l1_loss(pred, clean_in)
            terms = {"loss": loss}
            return loss, (terms, new_stats, pred, clean_in)
        else:
            pred = self.model.apply({"params": params}, aug)
            l1 = l1_loss(pred, clean)
            sc, mag = multi_resolution_stft_loss(
                pred, clean, factor_sc=self.factor_sc, factor_mag=self.factor_mag
            )
            loss = l1 + sc + mag
            terms = {"loss": loss, "l1_loss": l1, "sc_loss": sc, "mag_loss": mag}
            return loss, (terms, batch_stats, pred, clean)

    def _make_batch(self, clean, aug, key, banks):
        """Augment on-device when the loader ships clean-only batches.

        ``banks`` is the (noise_bank, ir_bank) pair threaded through the
        jitted step as an *argument* — a closed-over bank array would be
        baked into the XLA program as a constant, which breaks compilation
        once banks reach real DCASE size (hundreds of MB; the same
        constraint as the hash table, matcher_device.py _match_impl).
        Mirrors AugmentFP.batch_augment (augment/pipeline.py), where banks
        are jit arguments by design."""
        if aug is None:
            noise_bank, ir_bank = banks
            aug = self.augmenter._chain(
                key, clean[:, None, :], noise_bank, ir_bank
            )[:, 0, :]
        return aug

    def _compile_steps(self) -> None:
        mesh = self.mesh
        rep = replicated(mesh)
        dsh = batch_sharding(mesh)
        has_aug = self.augmenter is not None
        # device-resident bank data, uploaded once (leaves may be numpy)
        self._banks = (
            jax.tree_util.tree_map(
                jnp.asarray, (self.augmenter.noise_bank, self.augmenter.ir_bank)
            )
            if has_aug
            else None
        )

        def train_step(state: TrainState, clean, aug, key, lr_scale, banks):
            k_aug, k_drop = jax.random.split(key)
            if has_aug:
                aug = self._make_batch(clean, None, k_aug, banks)

            def loss_fn(params):
                return self._loss_terms(
                    params, state.batch_stats, clean, aug, k_drop, train=True
                )

            grads, (terms, new_stats, _, _) = jax.grad(loss_fn, has_aux=True)(
                state.params
            )
            opt_state = state.opt_state
            opt_state.hyperparams["learning_rate"] = self.base_lr * lr_scale
            updates, new_opt_state = self.tx.update(grads, opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_state = TrainState(
                params=new_params,
                batch_stats=new_stats,
                opt_state=new_opt_state,
                step=state.step + 1,
            )
            return new_state, terms

        def val_step(state: TrainState, clean, aug, key, banks):
            k_aug, k_drop = jax.random.split(key)
            if has_aug:
                aug = self._make_batch(clean, None, k_aug, banks)
            _, (terms, _, pred, target) = self._loss_terms(
                state.params, state.batch_stats, clean, aug, k_drop, train=False
            )
            terms = dict(terms)
            terms["psnr"] = psnr(pred, target)
            return terms

        if mesh.devices.size > 1:
            self._train_step = jax.jit(
                train_step,
                in_shardings=(rep, dsh, None if has_aug else dsh, rep, rep, rep),
                out_shardings=(rep, rep),
                donate_argnums=(0,),
            )
            self._val_step = jax.jit(
                val_step,
                in_shardings=(rep, dsh, None if has_aug else dsh, rep, rep),
                out_shardings=rep,
            )
        else:
            # Single device: skip sharding annotations entirely. (Through the
            # remote-TPU tunnel in this image, sharding-annotated executables
            # run ~20x slower than plain jit for the identical program.)
            self._train_step = jax.jit(train_step, donate_argnums=(0,))
            self._val_step = jax.jit(val_step)

    def _next_keys(self):
        self.rng, k = jax.random.split(self.rng)
        return k

    def _get_batch(self, iterator):
        batch = next(iterator)
        if isinstance(batch, tuple):
            clean, aug = batch
        else:
            clean, aug = batch, None
        clean = jnp.asarray(clean, jnp.float32)
        aug = jnp.asarray(aug, jnp.float32) if aug is not None else None
        return clean, aug

    # ------------------------------------------------------------ epochs

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        acc: Dict[str, float] = {}
        for _ in range(self.train_steps):
            clean, aug = self._get_batch(self.train_iter)
            self.state, terms = self._train_step(
                self.state, clean, aug, self._next_keys(),
                jnp.float32(self.scheduler.scale), self._banks,
            )
            for k, v in terms.items():
                acc[k] = acc.get(k, 0.0) + float(v)
        return {k: v / self.train_steps for k, v in acc.items()}

    def _val_batches(self):
        if not self.cache_validation_set:
            return (
                self._get_batch(self.val_iter) + (self._next_keys(),)
                for _ in range(self.val_steps)
            )
        if self._val_cache is None:
            self._val_cache = [
                self._get_batch(self.val_iter) for _ in range(self.val_steps)
            ]
        return (
            (clean, aug, key)
            for (clean, aug), key in zip(self._val_cache, self._val_keys)
        )

    def validation_epoch(self) -> Tuple[Dict[str, float], Dict[str, float]]:
        acc: Dict[str, float] = {}
        for clean, aug, key in self._val_batches():
            terms = self._val_step(self.state, clean, aug, key, self._banks)
            for k, v in terms.items():
                acc[k] = acc.get(k, 0.0) + float(v)
        out = {k: v / self.val_steps for k, v in acc.items()}
        metrics = {"psnr": out.pop("psnr")}
        self.scheduler.step(out["loss"])
        return out, metrics

    def start_epoch(self) -> None:
        """Pre-training baseline val metrics (ref: train.py:470-579)."""
        val_losses, val_metrics = self.validation_epoch()
        print(f"Baseline validation loss: {val_losses}")
        print(f"Baseline validation metrics: {val_metrics}")

    def training_loop(self) -> None:
        min_valid_loss = self.min_valid_loss
        for epoch in range(self.epoch_start, self.nb_epochs):
            if self.early_stopping.early_stop:
                break
            t0 = time.time()
            train_loss = self.train_epoch(epoch)
            print(f"\nEpoch {epoch}: {time.time() - t0:.2f} training seconds")
            print(f"Training Loss: {train_loss}")

            t0 = time.time()
            val_losses, val_metrics = self.validation_epoch()
            print(f"Epoch {epoch}: {time.time() - t0:.2f} validation seconds")
            print(f"Validation Loss: {val_losses} Metrics: {val_metrics}")

            self.early_stopping(val_losses["loss"])
            self.history.append(
                {"epoch": epoch, "train": train_loss, "val": val_losses,
                 "metrics": val_metrics}
            )

            if min_valid_loss > val_losses["loss"]:
                print(
                    f"Validation loss decreased from {min_valid_loss} to "
                    f"{val_losses['loss']}."
                )
                min_valid_loss = val_losses["loss"]
                self.min_valid_loss = min_valid_loss
                if self.save:
                    self._save_checkpoint("best_epoch", epoch)
            if self.save:
                self._save_checkpoint("last_epoch", epoch)
            if self.monitoring:
                self._log_tensorboard(epoch, train_loss, val_losses, val_metrics)
                if epoch % 10 == 0:
                    self._log_media(epoch)

    # ------------------------------------------------------------ ckpt

    def _ckpt_dir(self, name: str) -> str:
        return os.path.join(os.path.abspath(self.checkpoint), name)

    def _save_checkpoint(self, name: str, epoch: int) -> None:
        import orbax.checkpoint as ocp

        path = self._ckpt_dir(name)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(
            path,
            {
                "params": jax.device_get(self.state.params),
                "batch_stats": jax.device_get(dict(self.state.batch_stats)),
                "opt_state": jax.device_get(self.state.opt_state),
                "step": int(self.state.step),
            },
            force=True,
        )
        ckptr.wait_until_finished()
        meta = {
            "epoch": epoch,
            "best_val_loss": self.min_valid_loss,
            "scheduler": self.scheduler.state_dict(),
            "early_stopping": self.early_stopping.state_dict(),
        }
        with open(os.path.join(path, "trainer_meta.json"), "w") as f:
            json.dump(meta, f)

    def _maybe_resume(self) -> None:
        import orbax.checkpoint as ocp

        path = self._ckpt_dir("last_epoch")
        if not os.path.exists(os.path.join(path, "trainer_meta.json")):
            os.makedirs(self.checkpoint, exist_ok=True)
            return
        print(f"\nLoading checkpoint {path}.")
        ckptr = ocp.StandardCheckpointer()
        target = {
            "params": jax.device_get(self.state.params),
            "batch_stats": jax.device_get(dict(self.state.batch_stats)),
            "opt_state": jax.device_get(self.state.opt_state),
            "step": 0,
        }
        restored = ckptr.restore(path, target)
        self.state = TrainState(
            params=restored["params"],
            batch_stats=FrozenDict(restored["batch_stats"]),
            opt_state=restored["opt_state"],
            step=jnp.asarray(restored["step"], jnp.int32),
        )
        with open(os.path.join(path, "trainer_meta.json")) as f:
            meta = json.load(f)
        self.epoch_start = meta["epoch"]
        self.min_valid_loss = meta["best_val_loss"]
        self.scheduler.load_state_dict(meta["scheduler"])
        self.early_stopping.load_state_dict(meta["early_stopping"])
        print(f"Minimum validation loss is {self.min_valid_loss}...")
        print(f"Epoch is {self.epoch_start}...")

    # ------------------------------------------------------------ logging

    def _media_triplet(self, clean, aug, key):
        """(augmented, denoised) for a monitoring batch — jitted on first use."""
        if not hasattr(self, "_media_step"):
            has_aug = self.augmenter is not None

            def media_step(state, clean, aug, key, banks):
                if has_aug:
                    aug = self._make_batch(clean, None, key, banks)
                if self.input_type == "spec":
                    variables = {
                        "params": state.params, "batch_stats": state.batch_stats
                    }
                    pred = self.model.apply(
                        variables, spectrogram_batch(aug), train=False
                    )
                else:
                    pred = self.model.apply({"params": state.params}, aug)
                return aug, pred

            self._media_step = jax.jit(media_step)
        return self._media_step(self.state, clean, aug, key, self._banks)

    def _log_media(self, epoch: int) -> None:
        """wav + spectrogram triplets every 10 epochs
        (ref: training/train.py:318-338 — audio path only there; the spec
        path here logs spectrogram-domain triplets, which the reference
        cannot since its monitoring runs on waveforms)."""
        try:
            import tensorflow as tf  # noqa: F401
        except ImportError:
            return
        from musicfpaugment_tpu.train import callbacks

        clean, aug, key = next(iter(self._val_batches()))
        aug_out, pred = jax.device_get(self._media_triplet(clean, aug, key))
        clean = np.asarray(clean)
        writer = self._get_tb_writer()
        if self.input_type == "audio":
            callbacks.monitor_audios(writer, clean, aug_out, pred, epoch, "val")
            callbacks.monitor_specs(writer, clean, aug_out, pred, epoch, "val")
        else:
            callbacks.monitor_specs_precomputed(
                writer,
                spectrogram_batch(jnp.asarray(clean[:3])),
                spectrogram_batch(jnp.asarray(aug_out[:3])),
                pred[:3],
                epoch=epoch,
                datas="val",
            )

    def _get_tb_writer(self):
        import tensorflow as tf

        if not hasattr(self, "_tb_writer"):
            self._tb_writer = tf.summary.create_file_writer(
                os.path.join(self.checkpoint, "tb")
            )
        return self._tb_writer

    def _log_tensorboard(self, epoch, train_loss, val_losses, val_metrics):
        try:
            self._get_tb_writer()
            import tensorflow as tf

            with self._tb_writer.as_default():
                for k, v in train_loss.items():
                    tf.summary.scalar(f"train/{k}", v, step=epoch)
                for k, v in val_losses.items():
                    tf.summary.scalar(f"val/{k}", v, step=epoch)
                for k, v in val_metrics.items():
                    tf.summary.scalar(f"val/{k}", v, step=epoch)
        except ImportError:
            pass  # TB optional; history list always carries the scalars
