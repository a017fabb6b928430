"""Synthetic clean-audio batch source (tests, benchmarks, CLI fallback).

Generates onset-rich multitone 'music' batches so the full training and eval
stacks run end-to-end in environments without MTG-Jamendo/DCASE/FMA mounted.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np


def synthetic_clean_batches(
    batch_size: int,
    num_samples: int,
    sample_rate: int = 8000,
    seed: int = 59,
) -> Iterator[np.ndarray]:
    """Infinite iterator of (batch, num_samples) float32 clean batches."""
    rng = np.random.default_rng(seed)
    t = np.arange(num_samples) / sample_rate
    while True:
        batch = np.zeros((batch_size, num_samples), np.float32)
        n_notes = max(4, int(num_samples / sample_rate * 20))
        for b in range(batch_size):
            for _ in range(n_notes):
                f = rng.uniform(80, 3500)
                start = int(rng.integers(0, max(1, num_samples - sample_rate // 8)))
                dur = int(rng.integers(sample_rate // 16, sample_rate // 4))
                end = min(start + dur, num_samples)
                seg = np.arange(end - start)
                env = np.exp(-8.0 * seg / sample_rate).astype(np.float32)
                batch[b, start:end] += (
                    np.sin(2 * np.pi * f * seg / sample_rate).astype(np.float32)
                    * env
                    * rng.uniform(0.3, 1.0)
                )
            peak = np.abs(batch[b]).max()
            if peak > 0:
                batch[b] /= peak
        yield batch
