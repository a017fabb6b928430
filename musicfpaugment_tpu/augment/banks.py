"""Device-resident noise and impulse-response banks.

The reference performs disk I/O *inside* the augmentation hot path — every
call re-reads random IR wavs (ref:
augmentation/transformations/impulse_response.py:58-71) and random background
noise chunks (ref: background_noise.py:64-141). TPU-native design: decode and
normalize once on the host, keep fixed-shape float32 arrays resident in HBM,
and make "pick a random file" a gather by a random integer — the whole
augmentation chain then jits.

Sampling parity notes:

* Background noise: the reference picks a *scene* uniformly, then a file in
  that scene, crops it at a random offset (concatenating further RMS-
  normalized files when the clip is too short), then RMS-normalizes the
  result (background_noise.py:64-141). The bank stores one row per file with
  short files pre-extended at build time by concatenating additional
  RMS-normalized clips, so the device-side sampler is a scene-uniform,
  offset-uniform dynamic slice + RMS normalization. Exact for clips longer
  than the crop (the dominant case: DCASE scenes are 10 s, crops 3-8 s);
  statistically equivalent otherwise (divergence documented).
* samplePairing "mixup" (background_noise.py:11-12, 79-117): two rows are
  averaged before the final normalization, gated by ``mixup_pairs``.
* IRs: zero-padding every IR to the bank-wide max length is exact — the FFT
  convolution is linear and the padded tail contributes nothing.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from musicfpaugment_tpu.core.utils import rms_normalize
from musicfpaugment_tpu.data.audio_io import (
    Audio,
    find_audio_files_in_paths,
    read_wav,
    resample,
)

Array = jnp.ndarray


@struct.dataclass
class NoiseBank:
    """(num_clips, row_length) RMS-normalized noise rows + scene index."""

    clips: Array  # (N, L) float32
    scene_starts: Array  # (S,) int32 — first row of each scene
    scene_counts: Array  # (S,) int32 — rows per scene
    sample_rate: int = struct.field(pytree_node=False)

    @property
    def num_clips(self) -> int:
        return self.clips.shape[0]

    @property
    def row_length(self) -> int:
        return self.clips.shape[1]

    def sample(self, key: jax.Array, batch_size: int, num_samples: int) -> Array:
        """Draw (batch_size, num_samples) noise crops, scene-uniform."""
        k_scene, k_row, k_off = jax.random.split(key, 3)
        n_scenes = self.scene_starts.shape[0]
        scene = jax.random.randint(k_scene, (batch_size,), 0, n_scenes)
        row_u = jax.random.uniform(k_row, (batch_size,))
        row = self.scene_starts[scene] + (
            row_u * self.scene_counts[scene].astype(jnp.float32)
        ).astype(jnp.int32)
        max_off = self.row_length - num_samples
        if max_off <= 0:
            # full-row crops: a plain row gather (contiguous rows) — the
            # vmapped dynamic_slice below lowers to a windowed gather that
            # measured ~2.7x slower on v5e for the same (row, offset=0) draw
            crops = self.clips[row]
            return rms_normalize(crops)
        off = jax.random.randint(k_off, (batch_size,), 0, max_off + 1)

        def crop(r, o):
            return jax.lax.dynamic_slice(self.clips[r], (o,), (num_samples,))

        crops = jax.vmap(crop)(row, off)
        return rms_normalize(crops)

    def sample_pair(
        self, key: jax.Array, batch_size: int, num_samples: int
    ) -> Array:
        """samplePairing mixup: average of two independent draws
        (ref: background_noise.py:11-12, 105-117)."""
        k1, k2 = jax.random.split(key)
        a = self.sample(k1, batch_size, num_samples)
        b = self.sample(k2, batch_size, num_samples)
        return rms_normalize((a + b) / 2.0)


@struct.dataclass
class IRBank:
    """(num_irs, max_ir_length) zero-padded mono impulse responses."""

    irs: Array  # (N, L) float32
    lengths: Array  # (N,) int32 true lengths
    sample_rate: int = struct.field(pytree_node=False)

    @property
    def num_irs(self) -> int:
        return self.irs.shape[0]

    def sample(self, key: jax.Array, batch_size: int) -> Array:
        idx = jax.random.randint(key, (batch_size,), 0, self.num_irs)
        return self.irs[idx]


# ------------------------------------------------------------------ builders


def _extend_row(
    clip: np.ndarray, pool: List[np.ndarray], row_length: int, rng: np.random.Generator
) -> np.ndarray:
    """RMS-normalize and extend a clip to row_length by concatenating further
    RMS-normalized random clips (build-time equivalent of the reference's
    piece-concat loop, background_noise.py:69-138)."""
    pieces = [clip / (np.sqrt(np.mean(clip**2)) + 1e-8)]
    total = clip.shape[0]
    while total < row_length:
        extra = pool[int(rng.integers(len(pool)))]
        pieces.append(extra / (np.sqrt(np.mean(extra**2)) + 1e-8))
        total += extra.shape[0]
    row = np.concatenate(pieces)[:row_length]
    return row.astype(np.float32)


def build_noise_bank(
    background_paths: Union[Dict[str, List[str]], Sequence[str], np.ndarray],
    sample_rate: int,
    row_length: int = 8 * 8000,
    seed: int = 0,
    max_clips_per_scene: int | None = None,
) -> NoiseBank:
    """Build a NoiseBank from the reference's ``{scene: [paths]}`` dict, a
    flat path list, or a pre-decoded (N, T) array (for tests/synthetic)."""
    rng = np.random.default_rng(seed)

    if isinstance(background_paths, np.ndarray):
        arrays = [background_paths[i] for i in range(background_paths.shape[0])]
        scenes = {"synthetic": arrays}
    elif isinstance(background_paths, dict):
        # values may be file paths or pre-decoded arrays (scene-structured
        # synthetic banks — augment.dcase_shaped_banks — skip the decode)
        scenes = {}
        for scene, paths in background_paths.items():
            if max_clips_per_scene is not None:
                paths = list(paths)[:max_clips_per_scene]
            scenes[scene] = [
                np.asarray(p, np.float32)
                if isinstance(p, np.ndarray)
                else _load_mono(p, sample_rate)
                for p in paths
            ]
    else:
        scenes = {"all": [_load_mono(p, sample_rate) for p in background_paths]}

    pool = [c for clips in scenes.values() for c in clips]
    rows, starts, counts = [], [], []
    for scene in sorted(scenes):
        starts.append(len(rows))
        for clip in scenes[scene]:
            rows.append(_extend_row(clip, pool, row_length, rng))
        counts.append(len(rows) - starts[-1])
    if not rows:
        raise ValueError("There are no supported audio files found.")
    return NoiseBank(
        clips=jnp.asarray(np.stack(rows)),
        scene_starts=jnp.asarray(np.asarray(starts, np.int32)),
        scene_counts=jnp.asarray(np.asarray(counts, np.int32)),
        sample_rate=sample_rate,
    )


def build_ir_bank(
    ir_paths: Union[str, Sequence[str], np.ndarray],
    sample_rate: int,
    max_length: int | None = None,
) -> IRBank:
    """Build an IRBank from a directory, path list, or (N, T) array."""
    if isinstance(ir_paths, np.ndarray):
        irs = [ir_paths[i] for i in range(ir_paths.shape[0])]
    else:
        if isinstance(ir_paths, str):
            ir_paths = [ir_paths]
        files = find_audio_files_in_paths(ir_paths)
        if len(files) == 0:
            raise ValueError("There are no supported audio files found.")
        irs = [_load_mono(p, sample_rate) for p in files]
    lengths = np.asarray([ir.shape[0] for ir in irs], np.int32)
    pad_to = int(max_length or lengths.max())
    padded = np.zeros((len(irs), pad_to), np.float32)
    for i, ir in enumerate(irs):
        n = min(ir.shape[0], pad_to)
        padded[i, :n] = ir[:n]
    return IRBank(
        irs=jnp.asarray(padded),
        lengths=jnp.asarray(np.minimum(lengths, pad_to)),
        sample_rate=sample_rate,
    )


def _load_mono(path: Union[str, Tuple[str, str]], sample_rate: int) -> np.ndarray:
    """Decode to mono float32 at sample_rate. A 2-tuple denotes a mixup pair
    (averaged, matching samplePairing semantics at build time)."""
    if isinstance(path, (tuple, list)) and len(path) == 2 and not isinstance(path, str):
        a = _load_mono(path[0], sample_rate)
        b = _load_mono(path[1], sample_rate)
        n = min(a.shape[0], b.shape[0])
        return (a[:n] + b[:n]) / 2.0
    data, sr = read_wav(path)
    mono = data.mean(axis=0) if data.shape[0] > 1 else data[0]
    return resample(mono, sr, sample_rate)


__all__ = [
    "NoiseBank",
    "IRBank",
    "build_noise_bank",
    "build_ir_bank",
    "Audio",
]
