"""Time each sub-stage of the fused waveform->verdict program on the chip."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from musicfpaugment_tpu.afp.audfprint import AudfprintPeaks, DeviceMatcher, HashTable
from musicfpaugment_tpu.afp.audfprint import landmarks as lm
from musicfpaugment_tpu.afp.audfprint.matcher_device import _match_impl
from musicfpaugment_tpu.afp.audfprint.peaks import find_peaks_batch
from musicfpaugment_tpu.testing.parameters import afp_settings

B, SR, SEC = 64, 8000, 8
rng = np.random.default_rng(0)
wavs = jnp.asarray(rng.standard_normal((B, SEC * SR)).astype(np.float32))
_ = float(jnp.sum(wavs))

a = AudfprintPeaks(afp_settings["audfprint"])
ht = HashTable()
tracks = rng.standard_normal((B, 12 * SR)).astype(np.float32)
a.ingest_batch(ht, [f"t{i}" for i in range(B)], tracks)
dm = DeviceMatcher(ht)
print("eff_depth:", dm.eff_depth, flush=True)

MQH = 4096

def stage_peaks(w):
    return find_peaks_batch(w)

def stage_hash(w):
    m = find_peaks_batch(w)
    C = int(m.shape[-1])
    mp = -(-5 * C // 128) * 128
    return lm.hashes_from_masks_batched(m, max_peaks=mp, max_hashes=mp * 3)

def stage_dedup(w):
    th, v = stage_hash(w)

    def dc(th_row, v_row):
        big = jnp.iinfo(jnp.int32).max
        o1 = jnp.argsort(jnp.where(v_row, th_row[:, 1], big), stable=True)
        th_row, v_row = th_row[o1], v_row[o1]
        o2 = jnp.argsort(jnp.where(v_row, th_row[:, 0], big), stable=True)
        th_row, v_row = th_row[o2], v_row[o2]
        dup = ((th_row[1:, 0] == th_row[:-1, 0]) & (th_row[1:, 1] == th_row[:-1, 1]) & v_row[1:])
        v_row = v_row & jnp.concatenate([jnp.array([True]), ~dup])
        (idx,) = jnp.nonzero(v_row, size=MQH, fill_value=-1)
        keep = idx >= 0
        return th_row[jnp.where(keep, idx, 0)], keep

    return jax.vmap(dc)(th, v)

def stage_full(table, counts, hpi, w):
    th, keep = stage_dedup(w)
    return _match_impl(table, counts, hpi, th[..., 0], th[..., 1], keep,
                       depth=dm.eff_depth, num_ids=dm.num_ids,
                       max_candidates=min(20, dm.num_ids), window=2,
                       threshcount=5, maxtimebits=dm.maxtimebits,
                       max_query_frames=512)

def timeit(name, fn, *args, iters=4):
    out = fn(*args)
    _ = float(np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0])).ravel()[0])
    t0 = time.perf_counter()
    for _i in range(iters):
        out = fn(*args)
    _ = float(np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0])).ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1000:.1f} ms/batch ({B/dt:.0f} q/s)", flush=True)

timeit("peaks only", jax.jit(stage_peaks), wavs)
timeit("peaks+hash", jax.jit(stage_hash), wavs)
timeit("peaks+hash+dedup", jax.jit(stage_dedup), wavs)
timeit("full fused", jax.jit(stage_full), dm._table, dm._counts, dm._hpit, wavs)
