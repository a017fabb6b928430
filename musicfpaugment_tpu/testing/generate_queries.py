"""Query generation CLI (ref: testing/generate_queries.py:23-128).

``--queries=cleans``: random (seed 42) 8 s crop of each selected FMA track at
8 kHz mono -> one pickle per file. ``--queries=augmented``: each of the 10
frozen-seed(42) AugmentFP conditions applied to every clean query.

TPU-native change: augmented queries are produced in *batches* — clean
pickles are stacked and the whole batch runs through the jitted AugmentFP
chain in one XLA program (the reference loops file-by-file through the torch
chain, SURVEY.md §3.3 hot loop #2).
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import random
from typing import Dict, List, Optional

import numpy as np

from musicfpaugment_tpu.augment import AugmentFP
from musicfpaugment_tpu.data.audio_io import read_wav, resample
from musicfpaugment_tpu.testing.parameters import (
    WAVEFORM_SAMPLING_RATE,
    queries_paths,
    test_pipelines_parameters,
)

NOISE_SPLIT_PATH = os.environ.get(
    "MFPA_NOISE_SPLIT", "/workspace/src/training/splits/train.json"
)


def generate_clean_queries(
    paths: List[str],
    save_path: str,
    sr: int = WAVEFORM_SAMPLING_RATE,
    duration: int = 8,
    burn_in: int = 0,
    save: bool = False,
) -> None:
    """ref: generate_queries.py:23-60 (seed-42 random crops)."""
    random.seed(42)
    os.makedirs(save_path, exist_ok=True)
    for path in paths:
        if not os.path.isfile(path):
            print(path + " A file is missing")
            continue
        data, origin_sr = read_wav(path)
        waveform = data.mean(axis=0) if data.shape[0] > 1 else data[0]
        waveform = resample(waveform, origin_sr, sr)
        try:
            nb_samples_segment = sr * duration
            start = random.randrange(
                burn_in, waveform.shape[0] - nb_samples_segment - burn_in
            )
            waveform = waveform[start : start + nb_samples_segment]
            if save:
                name = os.path.basename(path).split(".")[0] + ".pkl"
                with open(os.path.join(save_path, name), "wb") as handle:
                    pickle.dump(np.asarray(waveform), handle)
        except Exception:
            print(path + " is " + str(waveform.shape[0]) + "long")


def generate_augmented_queries(
    save_path: str,
    parameters: Dict[str, float],
    save: bool = False,
    augmenter: Optional[AugmentFP] = None,
    cleans_path: Optional[str] = None,
    batch_size: int = 256,
) -> None:
    """Batched counterpart of ref: generate_queries.py:63-92."""
    if augmenter is None:
        with open(NOISE_SPLIT_PATH, "r") as f:
            noise_paths = json.load(f)
        augmenter = AugmentFP(
            noise_paths, WAVEFORM_SAMPLING_RATE, parameters=parameters
        )
    augmenter.freeze_parameters(42)
    os.makedirs(save_path, exist_ok=True)
    cleans_path = cleans_path or queries_paths["cleans"]
    clean_queries = sorted(os.listdir(cleans_path))

    for i in range(0, len(clean_queries), batch_size):
        names = clean_queries[i : i + batch_size]
        batch, kept, kept_idx = [], [], []
        for j, query in enumerate(names):
            try:
                with open(os.path.join(cleans_path, str(query)), "rb") as f:
                    clean_audio = np.asarray(pickle.load(f), np.float32).reshape(-1)
                batch.append(clean_audio)
                kept.append(query)
                kept_idx.append(i + j)
            except Exception:
                print("error with : ", query)
        if not batch:
            continue
        wavs = np.stack(batch)[:, None, :]  # (B, 1, T)
        # per-example keys folded from the *global* query index: the frozen
        # seed-42 query set is invariant to batch_size (VERDICT r1 #6)
        augmented = np.asarray(
            augmenter.batch_augment_indexed(wavs, kept_idx)
        )[:, 0, :]
        if save:
            for query, aug in zip(kept, augmented):
                with open(os.path.join(save_path, str(query)), "wb") as handle:
                    pickle.dump(np.asarray(aug), handle)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--queries", default="augmented")
    parser.add_argument("--save", action="store_true")
    args = parser.parse_args()

    if str(args.queries) == "cleans":
        import pandas as pd

        from musicfpaugment_tpu.testing.fma_preprocessing import DATASET_DIR, TestSet

        fma_large = pd.read_csv(
            os.path.join(DATASET_DIR, "fma_large_preprocessed.csv")
        )
        testset = TestSet(fma_large)
        testset.remove_short_tracks()
        selected_queries = testset.sample_queries()
        selected_queries = testset.remove_exceptions(selected_queries)
        generate_clean_queries(
            selected_queries, queries_paths["cleans"], save=args.save
        )

    if str(args.queries) == "augmented":
        for pipeline_type, params in test_pipelines_parameters.items():
            print(str(pipeline_type))
            generate_augmented_queries(
                queries_paths[str(pipeline_type)], params, save=args.save
            )


if __name__ == "__main__":
    main()
