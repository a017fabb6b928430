"""UNet magnitude-spectrogram denoiser (Flax linen, NHWC).

Same architecture as the reference (ref: training/unet.py:8-108): 4-down /
4-up UNet, 64->1024 channels, DoubleConv = 2x[3x3 conv (no bias) + BN + ReLU],
2x2 max-pool down, 2x2 stride-2 transposed-conv up, skip concat with odd-size
pad fix, 1x1 output conv, dropout (rate 0.05 in training) on the inner
levels. Layout is NHWC (TPU-native) instead of the reference's NCHW; inputs
are (batch, freq, time) magnitude spectrograms, the channel axis is added
internally.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jnp.ndarray


class DoubleConv(nn.Module):
    """(conv 3x3 -> BN -> ReLU) * 2 (ref: unet.py:8-25)."""

    out_channels: int
    mid_channels: Optional[int] = None
    dtype: Optional[Any] = None  # compute dtype (bf16 mixed precision); params stay f32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        mid = self.mid_channels or self.out_channels
        x = nn.Conv(mid, (3, 3), padding=1, use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype,
        )(x)
        x = nn.relu(x)
        x = nn.Conv(
            self.out_channels, (3, 3), padding=1, use_bias=False, dtype=self.dtype
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype,
        )(x)
        return nn.relu(x)


class Down(nn.Module):
    """max-pool 2x2 then DoubleConv (ref: unet.py:28-38)."""

    out_channels: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return DoubleConv(self.out_channels, dtype=self.dtype)(x, train=train)


class Up(nn.Module):
    """Upscale, pad-fix, concat skip, DoubleConv (ref: unet.py:41-65)."""

    out_channels: int
    bilinear: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x1: Array, x2: Array, train: bool = False) -> Array:
        in_channels = x1.shape[-1]
        if self.bilinear:
            b, h, w, c = x1.shape
            x1 = jax.image.resize(x1, (b, 2 * h, 2 * w, c), method="bilinear")
        else:
            x1 = nn.ConvTranspose(
                in_channels // 2, (2, 2), strides=(2, 2), padding="VALID",
                dtype=self.dtype,
            )(x1)
        # pad x1 to x2's spatial size (odd-dimension fix, unet.py:59-62)
        diff_h = x2.shape[1] - x1.shape[1]
        diff_w = x2.shape[2] - x1.shape[2]
        x1 = jnp.pad(
            x1,
            (
                (0, 0),
                (diff_h // 2, diff_h - diff_h // 2),
                (diff_w // 2, diff_w - diff_w // 2),
                (0, 0),
            ),
        )
        x = jnp.concatenate([x2, x1], axis=-1)
        mid = in_channels // 2 if self.bilinear else None
        return DoubleConv(self.out_channels, mid_channels=mid, dtype=self.dtype)(
            x, train=train
        )


class UNet(nn.Module):
    """ref: training/unet.py:77-108. ``rate`` is the dropout rate (0.05 in
    training, train.py:645-650)."""

    n_channels: int = 1
    n_classes: int = 1
    rate: float = 0.0
    bilinear: bool = False
    base: int = 64  # width scale; 64 = the reference channel plan
    dtype: Optional[Any] = None  # e.g. jnp.bfloat16 for mixed precision

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        """x: (batch, freq, time) or (batch, freq, time, channels)."""
        squeeze_channel = x.ndim == 3
        if squeeze_channel:
            x = x[..., None]
        dropout = lambda h: nn.Dropout(self.rate, deterministic=not train)(h)
        factor = 2 if self.bilinear else 1
        b = self.base
        dt = self.dtype
        if dt is not None:
            x = x.astype(dt)

        x1 = DoubleConv(b, dtype=dt)(x, train=train)
        x2 = dropout(Down(2 * b, dtype=dt)(x1, train=train))
        x3 = dropout(Down(4 * b, dtype=dt)(x2, train=train))
        x4 = dropout(Down(8 * b, dtype=dt)(x3, train=train))
        x5 = dropout(Down(16 * b // factor, dtype=dt)(x4, train=train))
        h = dropout(Up(8 * b // factor, self.bilinear, dtype=dt)(x5, x4, train=train))
        h = Up(4 * b // factor, self.bilinear, dtype=dt)(h, x3, train=train)
        h = Up(2 * b // factor, self.bilinear, dtype=dt)(h, x2, train=train)
        h = Up(b, self.bilinear, dtype=dt)(h, x1, train=train)
        logits = nn.Conv(self.n_classes, (1, 1))(h.astype(jnp.float32))
        if squeeze_channel and self.n_classes == 1:
            logits = logits[..., 0]
        return logits
