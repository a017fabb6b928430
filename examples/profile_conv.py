"""Microbenchmark conv strategies for the AugmentFP filter stages (scratch).

Workloads (B=256, T=64000 mono):
  HPF1: per-example 4097-tap kernels
  HPF3: per-example 2177-tap kernels
  LPF : per-example  129-tap kernels
Strategies: current fft_convolve (XLA FFT overlap-save), MXU-DFT overlap-save,
time-domain conv_general_dilated with batch groups.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from musicfpaugment_tpu.core import convolve as cv
from musicfpaugment_tpu.core.mxu_fft import mxu_fft_convolve_full

B, T = 256, 64000


def timeit(fn, *args, iters=8, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _ = float(jnp.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / iters


def os_frames(signal, n, chunk):
    m = signal.shape[-1]
    out_len = m + n - 1
    useful = chunk - (n - 1)
    n_chunks = -(-out_len // useful)
    total = (n_chunks - 1) * useful + chunk
    cfg = [(0, 0)] * (signal.ndim - 1) + [(n - 1, max(0, total - (m + n - 1)))]
    xp = jnp.pad(signal, cfg)
    idx = np.arange(n_chunks)[:, None] * useful + np.arange(chunk)[None, :]
    return xp[..., idx], n_chunks, useful, out_len


def conv_mxu_os(signal, kernel, chunk):
    n = kernel.shape[-1]
    frames, n_chunks, useful, out_len = os_frames(signal, n, chunk)
    seg = mxu_fft_convolve_full(frames, kernel[..., None, :], chunk)[..., n - 1 :]
    out = seg.reshape(*seg.shape[:-2], n_chunks * useful)
    return out[..., :out_len]


def conv_time_domain(signal, kernel):
    # per-example kernel as a grouped conv: feature_group_count=B over a
    # (1, B, T) input
    n = kernel.shape[-1]
    x = signal[None]  # (1, B, T)
    k = kernel[:, None, ::-1]  # (B, 1, n) OIH
    y = jax.lax.conv_general_dilated(
        x, k, window_strides=(1,), padding=[(n - 1, n - 1)],
        dimension_numbers=("NCH", "OIH", "NCH"), feature_group_count=B,
    )
    return y[0]


def main():
    rng = np.random.default_rng(0)
    sig = jnp.asarray(rng.standard_normal((B, T)).astype(np.float32))
    _ = float(jnp.sum(sig))
    for n in (4097, 2177, 129):
        ker = jnp.asarray(rng.standard_normal((B, n)).astype(np.float32) / n)
        _ = float(jnp.sum(ker))
        print(f"--- kernel {n} taps ---")
        dt = timeit(jax.jit(lambda s, k: cv.fft_convolve(s, k, mode="full")), sig, ker)
        print(f"xla-fft OS (auto chunk {cv._os_chunk_size(T, n)}): {dt*1e3:8.2f} ms")
        for chunk in (2048, 4096, 8192, 16384, 32768):
            if chunk < 2 * n:
                continue
            dt = timeit(jax.jit(lambda s, k, c=chunk: conv_mxu_os(s, k, c)), sig, ker)
            print(f"mxu-dft OS chunk {chunk:6d}: {dt*1e3:8.2f} ms")
        if n <= 256:
            dt = timeit(jax.jit(conv_time_domain), sig, ker)
            print(f"time-domain grouped conv: {dt*1e3:8.2f} ms")
    # single big fft for reference
    dt = timeit(jax.jit(lambda s: jnp.fft.irfft(jnp.fft.rfft(s, n=131072), n=131072)), sig)
    print(f"131072-pt rfft+irfft roundtrip: {dt*1e3:8.2f} ms")
    dt = timeit(jax.jit(lambda s: jnp.fft.irfft(jnp.fft.rfft(s, n=65536), n=65536)), sig)
    print(f"65536-pt rfft+irfft roundtrip: {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
