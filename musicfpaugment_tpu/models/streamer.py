"""Streaming Demucs inference with stateful frame-by-frame processing.

Port of the reference's ``DemucsStreamer`` (ref: training/model.py:350-564):
feed any amount of audio, get back as much denoised audio as is causally
available. State carried between frames: per-layer encoder outputs (so only
the new hop is recomputed), decoder tails, LSTM hidden state, sinc-resampling
edge buffers, and the online normalization variance.

The per-frame math runs as jnp ops on the Demucs flax parameters directly
(layer params addressed by their creation-order names); the frame loop is
host-driven like the reference. ``python -m musicfpaugment_tpu.models.streamer``
reproduces the reference's self-benchmark (model size, batch-vs-streaming
delta, initial lag, RTF — ref: model.py:567-609).
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from musicfpaugment_tpu.core.resample import downsample2, upsample2
from musicfpaugment_tpu.models.demucs import Demucs

Array = jnp.ndarray

_DN = ("NWC", "WIO", "NWC")


def _conv1d(x: Array, kernel: Array, bias: Array, stride: int = 1) -> Array:
    """x: (1, T, C_in) -> (1, T', C_out); VALID padding like torch Conv1d."""
    y = jax.lax.conv_general_dilated(
        x, kernel, (stride,), "VALID", dimension_numbers=_DN
    )
    return y + bias


def _conv_transpose1d(x: Array, kernel: Array, bias: Array, stride: int) -> Array:
    y = jax.lax.conv_transpose(
        x, kernel, (stride,), "VALID", dimension_numbers=_DN
    )
    return y + bias


def _glu(x: Array) -> Array:
    a, b = jnp.split(x, 2, axis=-1)
    return a * jax.nn.sigmoid(b)


def _lstm_step(cell_params, carry, x):
    """flax OptimizedLSTMCell step from raw params (ii/if/ig/io + hi/hf/hg/ho)."""
    c, h = carry
    gates = {}
    for g in ("i", "f", "g", "o"):
        gates[g] = (
            x @ cell_params[f"i{g}"]["kernel"]
            + h @ cell_params[f"h{g}"]["kernel"]
            + cell_params[f"h{g}"]["bias"]
        )
    i = jax.nn.sigmoid(gates["i"])
    f = jax.nn.sigmoid(gates["f"])
    g = jnp.tanh(gates["g"])
    o = jax.nn.sigmoid(gates["o"])
    c = f * c + i * g
    h = o * jnp.tanh(c)
    return (c, h), h


class DemucsStreamer:
    """Real-time streaming wrapper around trained Demucs params.

    Args mirror the reference (model.py:372-405): ``dry`` mixes back input,
    ``num_frames`` trades latency for throughput.
    """

    def __init__(
        self,
        demucs: Demucs,
        variables: Any,
        dry: float = 0,
        num_frames: int = 1,
        resample_lookahead: int = 64,
        resample_buffer: int = 256,
    ) -> None:
        assert demucs.causal, "streaming requires the causal (LSTM) variant"
        self.demucs = demucs
        self.params = variables["params"] if "params" in variables else variables
        self.lstm_state: Optional[List[Tuple[Array, Array]]] = None
        self.conv_state: Optional[List[Array]] = None
        self.dry = dry
        self.resample_lookahead = resample_lookahead
        resample_buffer = min(demucs.total_stride, resample_buffer)
        self.resample_buffer = resample_buffer
        self.frame_length = demucs.valid_length(1) + demucs.total_stride * (
            num_frames - 1
        )
        self.total_length = self.frame_length + self.resample_lookahead
        self.stride = demucs.total_stride * num_frames
        self.resample_in = np.zeros((demucs.chin, resample_buffer), np.float32)
        self.resample_out = np.zeros((demucs.chin, resample_buffer), np.float32)
        self.frames = 0
        self.total_time = 0.0
        self.variance = 0.0
        self.pending = np.zeros((demucs.chin, 0), np.float32)
        self._plan = demucs.channel_plan()
        # jitted per-frame programs (first frame has different shapes/state)
        self._frame_first = jax.jit(lambda f: self._frame_impl(f, None, None))
        self._frame_next = jax.jit(
            lambda f, cs, ls: self._frame_impl(f, cs, ls)
        )

    # ----------------------------------------------------------- params

    def _enc(self, i: int):
        p = self.params
        return p[f"Conv_{2 * i}"], p[f"Conv_{2 * i + 1}"]

    def _dec(self, j: int):
        p = self.params
        return p[f"Conv_{2 * self.demucs.depth + j}"], p[f"ConvTranspose_{j}"]

    # ----------------------------------------------------------- control

    def reset_time_per_frame(self) -> None:
        self.total_time = 0.0
        self.frames = 0

    @property
    def time_per_frame(self) -> float:
        return self.total_time / max(self.frames, 1)

    def flush(self) -> np.ndarray:
        """Zero-pad out the remaining audio and reset state
        (ref: model.py:415-428)."""
        self.lstm_state = None
        self.conv_state = None
        pending_length = self.pending.shape[1]
        padding = np.zeros((self.demucs.chin, self.total_length), np.float32)
        out = self.feed(padding)
        return out[:, :pending_length]

    # ----------------------------------------------------------- feed

    def feed(self, wav: np.ndarray) -> np.ndarray:
        """Process as much pending audio as possible (ref: model.py:430-497)."""
        import time as _time

        begin = _time.time()
        demucs = self.demucs
        resample_buffer = self.resample_buffer
        stride = self.stride
        resample = demucs.resample
        wav = np.asarray(wav, np.float32)
        if wav.ndim != 2:
            raise ValueError("input wav should be two dimensional.")
        chin, _ = wav.shape
        if chin != demucs.chin:
            raise ValueError(f"Expected {demucs.chin} channels, got {chin}")

        self.pending = np.concatenate([self.pending, wav], axis=1)
        outs = []
        while self.pending.shape[1] >= self.total_length:
            self.frames += 1
            frame = self.pending[:, : self.total_length]
            dry_signal = frame[:, :stride]
            if demucs.normalize:
                mono = frame.mean(0)
                variance = float((mono**2).mean())
                self.variance = (
                    variance / self.frames + (1 - 1 / self.frames) * self.variance
                )
                frame = frame / (demucs.floor + math.sqrt(self.variance))
            padded_frame = np.concatenate([self.resample_in, frame], axis=-1)
            self.resample_in[:] = frame[:, stride - resample_buffer : stride]
            frame_j = jnp.asarray(padded_frame)

            if resample == 4:
                frame_j = upsample2(upsample2(frame_j))
            elif resample == 2:
                frame_j = upsample2(frame_j)
            frame_j = frame_j[:, resample * resample_buffer :]
            frame_j = frame_j[:, : resample * self.frame_length]

            out, extra = self._separate_frame(frame_j)
            padded_out = jnp.concatenate(
                [jnp.asarray(self.resample_out), out, extra], axis=1
            )
            self.resample_out[:] = np.asarray(out[:, -resample_buffer:])
            if resample == 4:
                out = downsample2(downsample2(padded_out))
            elif resample == 2:
                out = downsample2(padded_out)
            else:
                out = padded_out
            out = out[:, resample_buffer // resample :]
            out = out[:, :stride]

            out_np = np.asarray(out)
            if demucs.normalize:
                out_np = out_np * math.sqrt(self.variance)
            out_np = self.dry * dry_signal + (1 - self.dry) * out_np
            outs.append(out_np)
            self.pending = self.pending[:, stride:]

        self.total_time += _time.time() - begin
        if outs:
            return np.concatenate(outs, axis=1)
        return np.zeros((chin, 0), np.float32)

    # ----------------------------------------------------------- frame

    def _separate_frame(self, frame: Array) -> Tuple[Array, Array]:
        """Incremental encoder/LSTM/decoder pass (ref: model.py:499-564),
        dispatched to one of two jitted programs (first vs steady state)."""
        if self.conv_state is None:
            out, extra, cs, ls = self._frame_first(frame)
        else:
            out, extra, cs, ls = self._frame_next(
                frame, tuple(self.conv_state), tuple(self.lstm_state)
            )
        self.conv_state = list(cs)
        self.lstm_state = list(ls)
        return out, extra

    def _frame_impl(
        self,
        frame: Array,
        conv_state: Optional[Tuple[Array, ...]],
        lstm_state: Optional[Tuple[Tuple[Array, Array], ...]],
    ):
        """Pure frame program: (frame, state) -> (out, extra, new states).

        ``conv_state`` caches, per non-final encoder layer, the layer's output
        for the current window (so only the samples uncovered by the cache are
        recomputed) and, per decoder layer, the transposed-conv tail that
        overlaps the next frame.
        """
        demucs = self.demucs
        depth = demucs.depth
        k = demucs.kernel_size
        s = demucs.stride
        first = conv_state is None
        state_in = [] if first else list(conv_state)
        next_state: List[Array] = []
        stride_i = self.stride * demucs.resample
        x = frame[None].swapaxes(1, 2)  # (1, T, C)
        skips = []
        for idx in range(depth):
            c0, c1 = self._enc(idx)
            stride_i //= s
            length = x.shape[1]
            if idx == depth - 1:
                x = _conv1d(x, c0["kernel"], c0["bias"], s)
                x = jax.nn.relu(x)
                x = _conv1d(x, c1["kernel"], c1["bias"], 1)
                x = _glu(x)
            else:
                prev = None
                if not first:
                    prev = state_in.pop(0)
                    prev = prev[:, stride_i:, :]
                    tgt = (length - k) // s + 1
                    missing = tgt - prev.shape[1]
                    offset = length - k - s * (missing - 1)
                    x = x[:, offset:, :]
                x = jax.nn.relu(_conv1d(x, c0["kernel"], c0["bias"], s))
                x = _glu(_conv1d(x, c1["kernel"], c1["bias"], 1))
                if prev is not None:
                    x = jnp.concatenate([prev, x], axis=1)
                next_state.append(x)
            skips.append(x)

        # LSTM bottleneck with carried state
        lstm = self.params["BLSTM_0"]
        n_cells = len([kk for kk in lstm if kk.startswith("OptimizedLSTMCell")])
        if lstm_state is None:
            dim = x.shape[-1]
            lstm_state = tuple(
                (jnp.zeros((1, dim)), jnp.zeros((1, dim))) for _ in range(n_cells)
            )
        h_seq = x[0]  # (T, C)
        new_lstm = []
        for li in range(n_cells):
            cell = lstm[f"OptimizedLSTMCell_{li}"]
            carry = lstm_state[li]
            (c, h), ys = jax.lax.scan(
                lambda cr, xt: _lstm_step(cell, cr, xt[None]),
                carry,
                h_seq,
            )
            new_lstm.append((c, h))
            h_seq = ys[:, 0, :]
        x = h_seq[None]

        extra = None
        for idx in range(depth):
            d1x1, dtr = self._dec(idx)
            skip = skips.pop(-1)
            x = x + skip[:, : x.shape[1], :]
            x = _glu(_conv1d(x, d1x1["kernel"], d1x1["bias"], 1))
            if extra is not None:
                skip_tail = skip[:, x.shape[1] :, :]
                extra = extra + skip_tail[:, : extra.shape[1], :]
                extra = _conv_transpose1d(
                    _glu(_conv1d(extra, d1x1["kernel"], d1x1["bias"], 1)),
                    dtr["kernel"],
                    dtr["bias"],
                    s,
                )
            x = _conv_transpose1d(x, dtr["kernel"], dtr["bias"], s)
            next_state.append(x[:, -s:, :] - dtr["bias"])
            if extra is None:
                extra = x[:, -s:, :]
            else:
                extra = extra.at[:, :s, :].add(next_state[-1])
            x = x[:, :-s, :]
            if not first:
                prev = state_in.pop(0)
                x = x.at[:, :s, :].add(prev)
            if idx != depth - 1:
                x = jax.nn.relu(x)
                extra = jax.nn.relu(extra)
        return (
            x[0].swapaxes(0, 1),  # (C, T)
            extra[0].swapaxes(0, 1),
            tuple(next_state),
            tuple(new_lstm),
        )


def _benchmark() -> None:
    """Streaming self-benchmark (ref: training/model.py:567-609)."""
    import argparse
    import time

    parser = argparse.ArgumentParser(
        "musicfpaugment_tpu.models.streamer",
        description="Benchmark the streaming Demucs implementation and check "
        "the delta with the offline implementation.",
    )
    parser.add_argument("--depth", default=5, type=int)
    parser.add_argument("--resample", default=4, type=int)
    parser.add_argument("--hidden", default=48, type=int)
    parser.add_argument("--sample_rate", default=16000, type=float)
    parser.add_argument("-f", "--num_frames", type=int, default=1)
    parser.add_argument("--seconds", type=float, default=10.0)
    args = parser.parse_args()
    sr = args.sample_rate
    sr_ms = sr / 1000
    demucs = Demucs(
        hidden=args.hidden, depth=args.depth, resample=args.resample
    )
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, int(sr * args.seconds))).astype(np.float32)
    variables = demucs.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = np.asarray(demucs.apply(variables, jnp.asarray(x)))
    streamer = DemucsStreamer(demucs, variables, num_frames=args.num_frames)
    out_lst = []
    frame_size = streamer.total_length
    pending = x
    while pending.shape[1] > 0:
        out_lst.append(streamer.feed(pending[:, :frame_size]))
        pending = pending[:, frame_size:]
        frame_size = streamer.demucs.total_stride
    out_lst.append(streamer.flush())
    out_rt = np.concatenate(out_lst, axis=1)
    model_size = (
        sum(p.size for p in jax.tree_util.tree_leaves(variables)) * 4 / 2**20
    )
    initial_lag = streamer.total_length / sr_ms
    tpf = 1000 * streamer.time_per_frame
    delta = np.linalg.norm(out - out_rt[:, : out.shape[1]]) / np.linalg.norm(out)
    print(f"model size: {model_size:.1f}MB, ", end="")
    print(f"delta batch/streaming: {delta:.2%}")
    print(f"initial lag: {initial_lag:.1f}ms, ", end="")
    print(f"stride: {streamer.stride * args.num_frames / sr_ms:.1f}ms")
    print(f"time per frame: {tpf:.1f}ms, ", end="")
    print(f"RTF: {tpf / (streamer.stride / sr_ms):.2f}")
    print(f"Total lag with computation: {initial_lag + tpf:.1f}ms")


if __name__ == "__main__":
    _benchmark()
