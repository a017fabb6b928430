"""Demucs waveform denoiser (Flax linen, NWC layout).

Same architecture as the reference (ref: training/model.py:163-326): depth-5
encoder/decoder with kernel 8 / stride 4 convs, GLU 1x1 convs, 2-layer
(B)LSTM bottleneck, skip connections, x4 sinc resampling
(core.resample.upsample2/downsample2), input std-normalization with floor,
``valid_length`` padding, and the std-based weight rescale init
(rescale_module, model.py:113-124) implemented as a post-init params
transform (:func:`rescale_params`).

Layout: waveforms enter as (batch, time) or (batch, channels, time) — the
reference's channel-first convention — and run internally as NWC.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from musicfpaugment_tpu.core.resample import downsample2, upsample2

Array = jnp.ndarray


class BLSTM(nn.Module):
    """Stacked (bi-)LSTM bottleneck (ref: training/model.py:91-110).

    ``dtype`` is the compute dtype (bf16 mixed precision; params stay f32) —
    the cell matmuls are the model's serial bottleneck, so they are the ones
    that must hit the MXU at bf16 rates."""

    dim: int
    layers: int = 2
    bi: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        """x: (batch, time, dim) -> (batch, time, dim)."""
        for _ in range(self.layers):
            if self.bi:
                fwd = nn.RNN(nn.OptimizedLSTMCell(self.dim, dtype=self.dtype))
                bwd = nn.RNN(
                    nn.OptimizedLSTMCell(self.dim, dtype=self.dtype),
                    reverse=True, keep_order=True,
                )
                x = jnp.concatenate([fwd(x), bwd(x)], axis=-1)
            else:
                x = nn.RNN(nn.OptimizedLSTMCell(self.dim, dtype=self.dtype))(x)
        if self.bi:
            x = nn.Dense(self.dim, dtype=self.dtype)(x)
        return x


def _glu(x: Array) -> Array:
    """GLU over the channel (trailing) axis — torch nn.GLU(1) in NWC."""
    a, b = jnp.split(x, 2, axis=-1)
    return a * jax.nn.sigmoid(b)


class Demucs(nn.Module):
    """ref: training/model.py:163-326 (defaults match: hidden 48, depth 5,
    kernel 8, stride 4, causal LSTM, x4 resample, GLU, growth 2)."""

    chin: int = 1
    chout: int = 1
    hidden: int = 48
    depth: int = 5
    kernel_size: int = 8
    stride: int = 4
    causal: bool = True
    resample: int = 4
    growth: int = 2
    max_hidden: int = 10000
    normalize: bool = True
    glu: bool = True
    floor: float = 1e-3
    sample_rate: int = 8000
    dtype: Any = None  # compute dtype (bf16 mixed precision); params stay f32

    def channel_plan(self):
        chin, chout, hidden = self.chin, self.chout, self.hidden
        plan = []
        for _ in range(self.depth):
            plan.append((chin, chout, hidden))
            chout = hidden
            chin = hidden
            hidden = min(int(self.growth * hidden), self.max_hidden)
        return plan

    def valid_length(self, length: int) -> int:
        """Nearest valid input length (ref: model.py:268-284)."""
        length = math.ceil(length * self.resample)
        for _ in range(self.depth):
            length = math.ceil((length - self.kernel_size) / self.stride) + 1
            length = max(length, 1)
        for _ in range(self.depth):
            length = (length - 1) * self.stride + self.kernel_size
        length = int(math.ceil(length / self.resample))
        return int(length)

    @property
    def total_stride(self) -> int:
        return self.stride**self.depth // self.resample

    @nn.compact
    def __call__(self, mix: Array, stop_at: str | None = None) -> Array:
        """mix: (batch, time) or (batch, channels, time), channel-first.

        ``stop_at`` returns the intermediate activation after a named
        milestone — ``frontend`` (normalize+pad+resample), ``enc1`` (first
        encoder stage), ``enc`` (all encoder stages), ``lstm``, ``dec``
        (decoder, pre-downsample). Profiling hook only (cumulative-prefix
        stage timing, examples/profile_demucs.py): standalone per-stage jits
        mislead because XLA fuses differently in context."""
        squeeze_channel = mix.ndim == 2
        if squeeze_channel:
            mix = mix[:, None, :]

        if self.normalize:
            mono = jnp.mean(mix, axis=1, keepdims=True)
            std = jnp.std(mono, axis=-1, keepdims=True)
            mix = mix / (self.floor + std)
        else:
            std = jnp.ones((), mix.dtype)
        length = mix.shape[-1]

        x = mix
        x = jnp.pad(
            x, ((0, 0), (0, 0), (0, self.valid_length(length) - length))
        )
        if self.resample == 2:
            x = upsample2(x)
        elif self.resample == 4:
            x = upsample2(upsample2(x))

        x = jnp.swapaxes(x, 1, 2)  # -> (B, T, C)
        if stop_at == "frontend":
            return x
        if self.dtype is not None:
            # sinc resampling stays f32 — the encoder/LSTM/decoder stack
            # computes in bf16. Stage profile (examples/profile_demucs.py,
            # on chip): the step is frontend/loss-bound, NOT BLSTM-bound
            # (13 ms of a 108 ms f32 fwd+bwd). Moving the sinc pair to a
            # Toeplitz matmul (core/convolve.toeplitz_conv1d) and the
            # MR-STFT loss to windowed DFT matmuls (losses.
            # stft_magnitude_matmul) took the step from 6.21 -> 8.47
            # steps/s f32 and 8.37 -> 12.92 steps/s bf16 on one chip.
            x = x.astype(self.dtype)
        ch_scale = 2 if self.glu else 1
        act = _glu if self.glu else nn.relu
        plan = self.channel_plan()

        skips = []
        for stage, (chin_i, _, hidden_i) in enumerate(plan):
            x = nn.Conv(hidden_i, (self.kernel_size,), strides=(self.stride,),
                        padding="VALID", dtype=self.dtype)(x)
            x = nn.relu(x)
            x = nn.Conv(hidden_i * ch_scale, (1,), dtype=self.dtype)(x)
            x = act(x)
            skips.append(x)
            if stage == 0 and stop_at == "enc1":
                return x
        if stop_at == "enc":
            return x

        lstm_dim = plan[-1][2]
        x = BLSTM(lstm_dim, bi=not self.causal, dtype=self.dtype)(x)
        if stop_at == "lstm":
            return x

        for i, (chin_i, chout_i, hidden_i) in enumerate(reversed(plan)):
            skip = skips.pop(-1)
            x = x + skip[:, : x.shape[1], :]
            x = nn.Conv(ch_scale * hidden_i, (1,), dtype=self.dtype)(x)
            x = act(x)
            x = nn.ConvTranspose(chout_i, (self.kernel_size,),
                                 strides=(self.stride,), padding="VALID",
                                 dtype=self.dtype)(x)
            if i < self.depth - 1:  # ReLU on all but the output decode
                x = nn.relu(x)

        if stop_at == "dec":
            return x
        x = jnp.swapaxes(x, 1, 2).astype(mix.dtype)  # -> (B, C, T), f32
        if self.resample == 2:
            x = downsample2(x)
        elif self.resample == 4:
            x = downsample2(downsample2(x))

        x = x[..., :length]
        out = std * x
        return out[:, 0, :] if squeeze_channel else out


def rescale_params(
    params: Dict[str, Any], reference: float = 0.1, eps: float = 1e-12
) -> Dict[str, Any]:
    """Demucs weight rescale init (ref: training/model.py:113-124).

    For every conv/conv-transpose kernel, divide kernel and bias by
    ``(std(kernel) / reference) ** 0.5``. Applied once after ``init``.
    """

    def visit(tree):
        if isinstance(tree, dict):
            if "kernel" in tree and tree["kernel"].ndim >= 3:
                kernel = tree["kernel"]
                scale = jnp.sqrt(jnp.std(kernel) / reference + eps)
                new = dict(tree)
                new["kernel"] = kernel / scale
                if "bias" in tree:
                    new["bias"] = tree["bias"] / scale
                return new
            return {k: visit(v) for k, v in tree.items()}
        return tree

    return visit(params)
