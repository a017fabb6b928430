"""Mesh-mode device matchers: sharded multi-chip serving must be
bit-identical to the single-device program.

Both AFP matchers accept ``mesh=``: the fused waveform->verdict program is
then jitted with the query batch sharded over the data axis and the corpus
replicated (no hot-path collectives — per-query work is independent). On the
virtual 8-device CPU mesh the SPMD partitioner must produce the same
verdicts, counts, and offsets as the unsharded program.
"""

import numpy as np
import pytest

from musicfpaugment_tpu.afp.audfprint import AudfprintPeaks, DeviceMatcher, HashTable
from musicfpaugment_tpu.afp.dejavu.matcher_device import (
    DejavuDeviceIndex,
    DejavuDeviceMatcher,
)
from musicfpaugment_tpu.parallel import make_mesh

PARAMS = {
    "density": 20,
    "pks-per-frame": 5,
    "freq-sd": 30,
    "shifts": 1,
    "samplerate": 8000,
    "n_fft": 512,
    "n_hop": 256,
}

SR = 8000


def _tone_track(rng, seconds, sr=SR):
    t = np.arange(seconds * sr)
    x = np.zeros(len(t), np.float32)
    for _ in range(40):
        f = rng.uniform(100, 3500)
        start = int(rng.integers(0, len(t) - sr // 4))
        dur = int(rng.integers(sr // 16, sr // 4))
        end = min(start + dur, len(t))
        seg = np.arange(end - start)
        env = np.exp(-8.0 * seg / sr).astype(np.float32)
        x[start:end] += (
            np.sin(2 * np.pi * f * seg / sr).astype(np.float32)
            * env
            * rng.uniform(0.3, 1.0)
        )
    x += 0.005 * rng.standard_normal(len(t)).astype(np.float32)
    return x / np.abs(x).max()


@pytest.fixture(scope="module")
def corpus():
    r = np.random.default_rng(17)
    tracks = np.stack([_tone_track(r, seconds=4) for _ in range(6)])
    queries = []
    for qi in range(16):  # divisible by the 8-device mesh
        tid = qi % len(tracks)
        start = int(r.integers(0, tracks.shape[1] - 2 * SR))
        queries.append(tracks[tid, start : start + 2 * SR])
    return tracks, np.stack(queries)


@pytest.mark.slow
def test_audfprint_mesh_matches_single(corpus):
    tracks, queries = corpus
    analyzer = AudfprintPeaks(PARAMS)
    ht = HashTable()
    analyzer.ingest_batch(
        ht, [f"track_{i}" for i in range(len(tracks))], tracks
    )
    single = DeviceMatcher(ht).match_waveforms(queries)
    mesh = make_mesh(8)
    sharded = DeviceMatcher(ht, mesh=mesh).match_waveforms(queries)
    assert sharded == single
    assert sum(s == "MATCH" for s, _, _ in single) >= len(queries) - 2


@pytest.mark.slow
def test_dejavu_mesh_matches_single(corpus):
    tracks, queries = corpus
    idx = DejavuDeviceIndex()
    idx.ingest_arrays([f"track_{i}" for i in range(len(tracks))], tracks)
    single = DejavuDeviceMatcher(idx).match_waveforms(queries)
    mesh = make_mesh(8)
    sharded = DejavuDeviceMatcher(idx, mesh=mesh).match_waveforms(queries)
    assert sharded == single
    assert sum(bool(r) for r in single) >= len(queries) - 2
