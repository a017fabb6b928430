"""Peak-mask Precision/Recall/F1 + PSNR — vectorized.

Counterpart of ref: testing/metrics.py:10-192, which loops over every peak
coordinate in Python with explicit border cases. Vectorized form: with a
tolerance kernel ``w``, ``recall = sum(conv2d(predicted, w) * gt) / sum(gt)``
and symmetrically for precision — identical sums, no loops, batched.

Fidelity note: the reference's kernel is ``[[0,0,0],[0,1,0],[0,0,0]]`` —
center-only, i.e. EXACT peak matching at interior points despite the
surrounding 3x3 machinery; its border branches index shifted slices against
``kernel[:2,:2]`` (which selects the [1,1] element) and therefore score the
*wrong neighbor* at mask borders — a bug we do not replicate. Default here is
the same exact-match kernel applied uniformly (identical to the reference
everywhere except its buggy borders); ``tolerance=1`` gives the +/-1
time-frequency-bin tolerant variant described in the paper.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from musicfpaugment_tpu.train.losses import psnr as _psnr

Array = jnp.ndarray


def psnr(pred, target):
    """Micro-averaged PSNR (ref: testing/metrics.py:7 torchmetrics)."""
    return _psnr(jnp.asarray(pred, jnp.float32), jnp.asarray(target, jnp.float32))


def _tolerance_sum(source: Array, tolerance: int) -> Array:
    """Box-sum of ``source`` over a (2*tol+1)^2 window (tol=0: identity)."""
    if tolerance == 0:
        return source
    k = 2 * tolerance + 1
    nb = source.ndim - 2
    window = (1,) * nb + (k, k)
    strides = (1,) * source.ndim
    pads = tuple((0, 0) if i < nb else (k // 2, k // 2) for i in range(source.ndim))
    return jax.lax.reduce_window(source, 0.0, jax.lax.add, window, strides, pads)


class Recall:
    """Fraction of ground-truth peaks retrieved by the prediction
    (ref: testing/metrics.py:10-85)."""

    def __init__(self, tolerance: int = 0) -> None:
        self.tolerance = tolerance

    def __call__(self, predicted, gt) -> float:
        predicted = jnp.asarray(predicted, jnp.float32)
        gt = jnp.asarray(gt, jnp.float32)
        n_gt = jnp.sum(gt)
        if float(n_gt) == 0:
            return 0.0
        retrieved = jnp.sum(_tolerance_sum(predicted, self.tolerance) * gt)
        return float(retrieved / n_gt)

    forward = __call__


class Precision:
    """Fraction of predicted peaks that hit a ground-truth peak
    (ref: testing/metrics.py:88-162)."""

    def __init__(self, tolerance: int = 0) -> None:
        self.tolerance = tolerance

    def __call__(self, predicted, gt) -> float:
        predicted = jnp.asarray(predicted, jnp.float32)
        gt = jnp.asarray(gt, jnp.float32)
        n_pred = jnp.sum(predicted)
        if float(n_pred) == 0:
            return 0.0
        relevant = jnp.sum(_tolerance_sum(gt, self.tolerance) * predicted)
        return float(relevant / n_pred)

    forward = __call__


class F1score:
    """Harmonic mean of Precision and Recall (ref: testing/metrics.py:165-192)."""

    def __init__(self, tolerance: int = 0) -> None:
        self.prec = Precision(tolerance)
        self.rec = Recall(tolerance)

    def __call__(self, predicted, gt) -> float:
        p = self.prec(predicted, gt)
        r = self.rec(predicted, gt)
        if math.isclose(p + r, 0.0):
            return 0.0
        return float(2.0 * (p * r) / (p + r))

    forward = __call__


def batch_peak_metrics(
    predicted: np.ndarray, gt: np.ndarray, tolerance: int = 0, reduce: bool = True
) -> dict:
    """Batched (B, F, C) masks -> {precision, recall, f1} in one device pass —
    the TPU-native path for peaks_metrics over 10k queries. ``reduce=False``
    returns the per-example (B,) arrays instead of batch means (callers that
    accumulate across uneven chunks need sums, not means of means)."""
    predicted = jnp.asarray(predicted, jnp.float32)
    gt = jnp.asarray(gt, jnp.float32)
    tol_pred = _tolerance_sum(predicted, tolerance)
    tol_gt = _tolerance_sum(gt, tolerance)
    axes = tuple(range(1, predicted.ndim))
    n_gt = jnp.sum(gt, axis=axes)
    n_pred = jnp.sum(predicted, axis=axes)
    recall = jnp.where(n_gt > 0, jnp.sum(tol_pred * gt, axis=axes) / n_gt, 0.0)
    precision = jnp.where(
        n_pred > 0, jnp.sum(tol_gt * predicted, axis=axes) / n_pred, 0.0
    )
    denom = precision + recall
    f1 = jnp.where(denom > 0, 2 * precision * recall / jnp.where(denom > 0, denom, 1), 0.0)
    if not reduce:
        return {"precision": precision, "recall": recall, "f1": f1}
    return {
        "precision": float(jnp.mean(precision)),
        "recall": float(jnp.mean(recall)),
        "f1": float(jnp.mean(f1)),
    }


def batch_psnr(pred, target):
    """Per-example PSNR (B,) — each row scored like :func:`psnr` on its own
    (the sequential harness calls psnr once per query pair)."""
    pred = jnp.asarray(pred, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    return jax.vmap(_psnr)(pred, target)
