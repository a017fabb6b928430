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
    # Collapse x4-upsample + first encoder conv into ONE stride-1 conv at
    # the original rate (core/resample.up4_phase_basis): the learned (8,
    # chin, hidden) kernel combines the 8 fixed phase FIRs into a ~171-tap
    # MXU conv, so the (B, 4T) upsampled intermediates are never
    # materialized. Boundary-exact: the unfused pipeline truncates the x2
    # intermediate, so the first/last ~basis-width output frames are
    # recomputed through the real unfused ops on short slices. Same param
    # tree as unfused (checkpoint-interchangeable).
    fused_frontend: bool = False

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

    def _fused_first_conv(self, conv0: nn.Conv, x: Array) -> Array:
        """x4-upsample + first encoder conv as ONE stride-1 conv at the
        original rate.

        ``z = up4(x)`` obeys ``z[4m+k] = (C_k ⊛ x)[m]`` for 8 fixed FIRs
        (core/resample.up4_phase_basis), so the stride-4 kernel-8 conv over
        ``z`` is ``out[m] = Σ_k w_k (C_k ⊛ x)[m] = (W ⊛ x)[m]`` with the
        per-step combined kernel ``W = Σ_k w_k C_k`` (~171 taps) — the
        (B, 4T) intermediates never exist. The composition is exact in the
        interior; the unfused pipeline truncates the x2 intermediate at the
        signal boundary, so the first/last ``D+2`` output frames are
        recomputed through the real unfused ops on short slices (same
        shared ``conv0`` params)."""
        from musicfpaugment_tpu.core.resample import up4_phase_basis

        c_np, d = up4_phase_basis()
        # materialize conv0's params (same names/shapes as the unfused
        # call) without running a strided conv over real data
        _ = conv0(jnp.zeros((1, self.kernel_size, x.shape[-1]), x.dtype))
        kern = conv0.variables["params"]["kernel"]  # (8, chin, hidden) f32
        bias = conv0.variables["params"]["bias"]
        if self.dtype is not None:
            kern = kern.astype(self.dtype)
            bias = bias.astype(self.dtype)
        c = jnp.asarray(c_np, x.dtype)  # (8, 2d+1)
        # correlation form: F'[t] = Σ_k kern[k] C[k, 2d − t]
        f = jnp.einsum("kio,kt->tio", kern, c[:, ::-1])
        y = jax.lax.conv_general_dilated(
            x, f, window_strides=(1,), padding=[(d, d - 1)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        ) + bias
        eo = d + 2
        ls = eo + d + 8
        t = x.shape[1]

        def unfused(seg: Array) -> Array:  # (B, L, chin) -> (B, L-1, hidden)
            z = upsample2(upsample2(jnp.swapaxes(seg, 1, 2)))
            return conv0(jnp.swapaxes(z, 1, 2))

        y = y.at[:, :eo].set(unfused(x[:, :ls])[:, :eo])
        y = y.at[:, t - 1 - eo :].set(unfused(x[:, t - ls :])[:, -eo:])
        return y

    def _fused_last_deconv(self, convt: nn.ConvTranspose, x: Array) -> Array:
        """Last decoder ConvTranspose (kernel 8 / stride 4) + x4 downsample
        as ONE stride-1 conv at the original rate.

        ``out[n] = Σ_j Σ_i h[j,i] R[n−j, i, o]`` with the per-step kernel
        ``R[e] = Σ_k K[k] S_k[e]`` over the 8 fixed downsampler phase FIRs
        (core/resample.down4_phase_basis; rows 4..7 carry the transpose
        kernel's second input-frame offset). The ConvTranspose bias feeds
        the downsampler as a constant, contributing ``bias * Σ taps`` of
        the 4 phase filters. Interior-exact; the first/last ``D+2`` outputs
        are recomputed through the real unfused ops on short slices."""
        from musicfpaugment_tpu.core.resample import (
            down4_phase_basis,
            downsample2,
        )

        s_np, d = down4_phase_basis()
        _ = convt(jnp.zeros((1, 1, x.shape[-1]), x.dtype))
        kern = convt.variables["params"]["kernel"]  # (8, in, out) f32
        bias = convt.variables["params"]["bias"]
        if self.dtype is not None:
            kern = kern.astype(self.dtype)
        s = jnp.asarray(s_np, kern.dtype)  # (8, 2d+1)
        gamma = float(s_np[:4].sum())
        # flax ConvTranspose applies the FLIPPED kernel (z[4j+t] reads
        # kern[K-1-t]); correlation form: F[t] = R[d − t] → flip taps too
        f = jnp.einsum("kio,kt->tio", kern[::-1], s[:, ::-1])
        y = jax.lax.conv_general_dilated(
            x, f, window_strides=(1,), padding=[(d, d + 1)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        ) + bias.astype(jnp.float32) * gamma
        eo = d + 2
        ls = eo + d + 8
        t = x.shape[1]

        def unfused(seg: Array) -> Array:  # (B, L, in) -> (B, L+1, out)
            z = jnp.swapaxes(convt(seg), 1, 2).astype(jnp.float32)
            z = downsample2(downsample2(z))
            return jnp.swapaxes(z, 1, 2)

        y = y.at[:, :eo].set(unfused(x[:, :ls])[:, :eo])
        y = y.at[:, t + 1 - eo :].set(unfused(x[:, t - ls :])[:, -eo:])
        return y

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
        do_fuse = self.fused_frontend and self.resample == 4
        if not do_fuse:
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
            conv_s = nn.Conv(hidden_i, (self.kernel_size,),
                             strides=(self.stride,), padding="VALID",
                             dtype=self.dtype)
            if stage == 0 and do_fuse:
                x = self._fused_first_conv(conv_s, x)
            else:
                x = conv_s(x)
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
            convt = nn.ConvTranspose(chout_i, (self.kernel_size,),
                                     strides=(self.stride,), padding="VALID",
                                     dtype=self.dtype)
            if i == self.depth - 1 and do_fuse:
                x = self._fused_last_deconv(convt, x)  # already rate-1
            else:
                x = convt(x)
            if i < self.depth - 1:  # ReLU on all but the output decode
                x = nn.relu(x)

        if stop_at == "dec":
            return x
        x = jnp.swapaxes(x, 1, 2).astype(mix.dtype)  # -> (B, C, T), f32
        if not do_fuse:
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
