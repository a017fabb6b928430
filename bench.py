"""Headline benchmark: batched AugmentFP throughput on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The BASELINE.json north star is >=50k augmented 8s@8kHz clips/sec on a v5e-8
(8 chips) — i.e. 6250 clips/sec/chip; ``vs_baseline`` is measured throughput
divided by that per-chip target. The reference processes these clips through
a per-example Python chain with disk I/O inside the hot path
(augmentation/__init__.py:95-97); here the full 8-stage chain is one jitted
XLA program over device-resident banks.

Secondary numbers (peak-extraction throughput, train step rate) go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def bench_augment(batch_size: int = 256, seconds: int = 8, sr: int = 8000):
    import jax

    from musicfpaugment_tpu import augment

    n = seconds * sr
    noise_bank, ir_bank = augment.synthetic_banks(
        sample_rate=sr, noise_row_length=n, num_noise=32, num_irs=16
    )
    fp = augment.AugmentFP(noise_bank, sr, impulse_response_dir=ir_bank)
    rng = np.random.default_rng(0)
    wavs = jax.numpy.asarray(
        rng.standard_normal((batch_size, 1, n)).astype(np.float32)
    )
    key = jax.random.PRNGKey(0)

    # warmup / compile, plus a few extra calls to fill the dispatch pipeline
    t0 = time.perf_counter()
    fp.batch_augment(wavs, key=key).block_until_ready()
    log(f"augment compile+first batch: {time.perf_counter() - t0:.1f}s")
    warm_keys = jax.random.split(jax.random.PRNGKey(2), 8)
    for k in warm_keys:
        out = fp.batch_augment(wavs, key=k)
    out.block_until_ready()

    iters = 48
    keys = jax.random.split(jax.random.PRNGKey(1), iters)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fp.batch_augment(wavs, key=keys[i])
    out.block_until_ready()
    dt = time.perf_counter() - t0
    clips_per_sec = batch_size * iters / dt
    log(f"augment: {clips_per_sec:.0f} clips/s ({dt/iters*1000:.1f} ms/batch of {batch_size})")
    return clips_per_sec


def bench_peaks(batch_size: int = 64, seconds: int = 8, sr: int = 8000):
    import jax

    from musicfpaugment_tpu.afp.audfprint.peaks import find_peaks_batch

    rng = np.random.default_rng(1)
    wavs = jax.numpy.asarray(
        rng.standard_normal((batch_size, seconds * sr)).astype(np.float32)
    )
    fn = jax.jit(find_peaks_batch)
    t0 = time.perf_counter()
    fn(wavs).block_until_ready()
    log(f"peaks compile+first batch: {time.perf_counter() - t0:.1f}s")
    # vary the input per call so no layer can memoize identical executions;
    # chain a cheap dependency so iterations serialize on device
    iters = 16
    jax.block_until_ready(fn(wavs))  # pipeline warm
    t0 = time.perf_counter()
    cur = wavs
    for i in range(iters):
        mask = fn(cur)
        # feed a scalar derived from the mask back into the next input
        cur = wavs + jax.numpy.sum(
            mask.astype(jax.numpy.float32), axis=(1, 2)
        )[:, None] * 1e-9
    jax.block_until_ready(cur)
    dt = time.perf_counter() - t0
    qps = batch_size * iters / dt
    log(f"audfprint peaks: {qps:.0f} queries/s")
    return qps


def main() -> None:
    clips_per_sec = bench_augment()
    try:
        bench_peaks()
    except Exception as e:  # secondary metric must not break the headline
        log(f"peaks bench skipped: {e}")

    per_chip_target = 50000 / 8  # north star: 50k/s on v5e-8
    print(
        json.dumps(
            {
                "metric": "augmented 8s@8kHz clips/sec/chip",
                "value": round(clips_per_sec, 1),
                "unit": "clips/s",
                "vs_baseline": round(clips_per_sec / per_chip_target, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
