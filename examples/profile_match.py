"""Stage-level profile of the end-to-end match path on the real chip:
peaks -> device-hashing -> host-hashing -> DeviceMatcher, timed separately."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from musicfpaugment_tpu.afp.audfprint import AudfprintPeaks, DeviceMatcher, HashTable
from musicfpaugment_tpu.afp.audfprint import landmarks as lm
from musicfpaugment_tpu.testing.parameters import afp_settings

B, SR, SEC = 64, 8000, 8
rng = np.random.default_rng(0)
a = AudfprintPeaks(afp_settings["audfprint"])
wavs = rng.standard_normal((B, SEC * SR)).astype(np.float32)

def sync(x):
    return float(np.asarray(jax.device_get(x)).ravel()[0])

def timeit(name, fn, iters=4):
    fn()  # compile/warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1000:.1f} ms/batch ({B/dt:.0f} q/s)", flush=True)
    return out

masks_dev = timeit("peaks", lambda: (lambda m: (sync(m[0, 0, 0]), m)[1])(a.peaks_batch(wavs)))

timeit("device hashing (vmapped hashes_from_mask)",
       lambda: (lambda o: (sync(o[0][0, 0, 0]), o)[1])(a._hashes_from_masks_device(masks_dev)))

masks_np = np.asarray(jax.device_get(masks_dev))
timeit("host hashing (per-example loop)",
       lambda: [lm.hashes_from_mask_np(masks_np[b]) for b in range(B)], iters=2)

ht = HashTable()
tracks = rng.standard_normal((B, 12 * SR)).astype(np.float32)
a.ingest_batch(ht, [f"t{i}" for i in range(B)], tracks)
dm = DeviceMatcher(ht)
hashes_list = a.hashes_batch(wavs, shifts=1, device_hashing=False)
timeit("device match (DeviceMatcher)", lambda: dm.match_hashes_batch(hashes_list), iters=4)

t0 = time.perf_counter()
hl = a.hashes_batch(wavs, shifts=1, device_hashing=False)
print(f"hashes_batch host path total: {(time.perf_counter()-t0)*1000:.0f} ms", flush=True)
t0 = time.perf_counter()
hl = a.hashes_batch(wavs, shifts=1, device_hashing=True)
print(f"hashes_batch device path total: {(time.perf_counter()-t0)*1000:.0f} ms", flush=True)
