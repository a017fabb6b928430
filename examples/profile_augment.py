"""Stage-level AugmentFP profile on the real chip (VERDICT r1 item 2).

Times each of the 8 chain stages as its own jitted program plus the fused
full chain, so the per-stage budget is visible. Readback barrier per
iteration group (see bench.py sync note).

Run: python examples/profile_augment.py [--batch 256]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# persistent compile cache: the per-stage programs pay one multi-minute
# degraded-tunnel compile each on first run; cached re-runs are cheap
jax.config.update(
    "jax_compilation_cache_dir", os.environ.get("MFPA_JAX_CACHE", "/tmp/jaxcache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from musicfpaugment_tpu import augment

SR = 8000


def timeit(fn, *args, iters=8, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _ = float(jnp.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--seconds", type=int, default=8)
    args = ap.parse_args()
    B, T = args.batch, args.seconds * SR

    noise_bank, ir_bank = augment.synthetic_banks(
        sample_rate=SR, noise_row_length=T, num_noise=32, num_irs=16
    )
    fp = augment.AugmentFP(noise_bank, SR, impulse_response_dir=ir_bank)
    rng = np.random.default_rng(0)
    wavs = jnp.asarray(rng.standard_normal((B, T)).astype(np.float32))
    _ = float(jnp.sum(wavs))
    key = jax.random.PRNGKey(0)

    total = 0.0
    for tf in fp.augmentation_pipeline.transforms:
        name = type(tf).__name__

        def stage(k, x, tf=tf):
            return tf(k, x, SR, noise_bank=fp.noise_bank, ir_bank=fp.ir_bank)

        dt = timeit(jax.jit(stage), key, wavs)
        total += dt
        print(f"{name:28s} {dt*1e3:8.2f} ms  ({B/dt:8.0f} clips/s)")

    print(f"{'SUM OF STAGES':28s} {total*1e3:8.2f} ms  ({B/total:8.0f} clips/s)")

    def chain(k, x):
        return fp._chain(k, x[:, None, :], fp.noise_bank, fp.ir_bank)

    dt = timeit(jax.jit(chain), key, wavs)
    print(f"{'FULL CHAIN':28s} {dt*1e3:8.2f} ms  ({B/dt:8.0f} clips/s)")


if __name__ == "__main__":
    main()
