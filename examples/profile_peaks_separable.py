"""Kernel profile: dejavu peak detection, square vs separable window.

``detect_peaks_mask`` (afp/dejavu/fingerprint.py) implements the
reference's scipy construction (ref: afp/dejavu/fingerprint.py:94-152,
``maximum_filter`` over a 21x21 iterated-structure footprint) with XLA
``reduce_window``. Because max and AND are associative and commutative,
the square footprint factors exactly into two 1-D passes (k+k taps
instead of k*k) — bit-identical output. This script measures both
formulations on the real chip over a big spectrogram batch and asserts
bit-equality, writing the evidence JSON the README cites.

Run:
  python examples/profile_peaks_separable.py \
      --out examples/scale_out/profile_peaks_separable.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _detect_peaks_square(arr, amp_min, k):
    """The pre-optimization formulation: one 2-D (k, k) reduce_window."""
    import jax
    import jax.numpy as jnp

    nbatch = arr.ndim - 2
    window = (1,) * nbatch + (k, k)
    strides = (1,) * arr.ndim
    pads = tuple(
        (0, 0) if i < nbatch else (k // 2, k // 2) for i in range(arr.ndim)
    )
    local_max = (
        jax.lax.reduce_window(
            arr, -jnp.inf, jax.lax.max, window, strides, pads
        )
        == arr
    )
    background = arr == 0
    eroded = jax.lax.reduce_window(
        background, True, jnp.logical_and, window, strides, pads
    )
    return (local_max != eroded) & (arr > amp_min)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--freqs", type=int, default=2049)
    p.add_argument("--frames", type=int, default=1550)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--out", default="")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from musicfpaugment_tpu.afp.dejavu.fingerprint import (
        _square_footprint_size,
        detect_peaks_mask,
    )

    k = _square_footprint_size(10, 2)  # the reference's defaults
    rng = np.random.default_rng(1)
    spec = jnp.asarray(
        rng.uniform(0, 80, (args.batch, args.freqs, args.frames)).astype(
            np.float32
        )
    )

    fns = {
        "square": jax.jit(lambda s: _detect_peaks_square(s, 50.0, k)),
        "separable": jax.jit(lambda s: detect_peaks_mask(s, amp_min=50)),
    }
    report = {
        "device": jax.devices()[0].platform,
        "k": k,
        "shape": [args.batch, args.freqs, args.frames],
    }
    for name, f in fns.items():
        t0 = time.perf_counter()
        out = f(spec)
        _ = bool(out.ravel()[0])  # scalar readback: the reliable sync
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = f(spec)
        _ = bool(out.ravel()[0])
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        report[name] = {
            "compile_plus_first_s": round(compile_s, 1),
            "steady_ms_per_call": round(ms, 2),
            "specs_per_sec": round(args.batch / (ms / 1e3), 1),
        }
        print(name, report[name], flush=True)

    a = np.asarray(jax.device_get(fns["square"](spec)))
    b = np.asarray(jax.device_get(fns["separable"](spec)))
    report["bit_equal"] = bool((a == b).all())
    report["n_peaks"] = int(a.sum())
    report["speedup"] = round(
        report["square"]["steady_ms_per_call"]
        / report["separable"]["steady_ms_per_call"],
        2,
    )
    print(json.dumps(report), flush=True)
    assert report["bit_equal"], "separable window must be bit-identical"
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(report, fh, indent=2)
            fh.write("\n")
        print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()
