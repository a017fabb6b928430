"""MTG-Jamendo split parsing + data loaders (ref: training/jamendo.py:34-197).

Split semantics are verbatim: autotagging split-0 TSVs; validation = the
first ``val_steps * batch`` seed-4-shuffled validation ids; the remaining
validation ids and the whole test split fold into training.
"""

from __future__ import annotations

import csv
import os
import random
from collections import defaultdict
from typing import Any, DefaultDict, Dict, Tuple

import numpy as np

from musicfpaugment_tpu.data.dataset import AugmentationDataset
from musicfpaugment_tpu.train.parameters import (
    DURATION,
    N_SEGMENTS,
    TRAIN_BUFFER_SIZE,
    VAL_BUFFER_SIZE,
    VAL_STEPS,
    WAVEFORM_SAMPLING_RATE,
)

JAMENDO_ROOT = os.environ.get("MFPA_JAMENDO_ROOT", "/workspace/mtg-jamendo-dataset/")


def get_length(values: Any) -> int:
    return len(str(max(values)))


def get_id(value: str) -> int:
    return int(value.split("_")[1])


def read_file(
    tsv_file: str,
) -> Tuple[Dict[int, Dict[str, Any]], DefaultDict[Any, Dict[Any, Any]], Dict[str, int]]:
    """Parse an MTG-Jamendo autotagging TSV (ref: jamendo.py:34-87)."""
    tracks: Dict[int, Dict[str, Any]] = {}
    tags: DefaultDict[Any, Dict[Any, Any]] = defaultdict(dict)
    artist_ids = set()
    albums_ids = set()
    with open(tsv_file) as fp:
        reader = csv.reader(fp, delimiter="\t")
        next(reader, None)
        for row in reader:
            track_id = get_id(row[0])
            tracks[track_id] = {
                "artist_id": get_id(row[1]),
                "album_id": get_id(row[2]),
                "path": row[3],
                "duration": float(row[4]),
                "tags": row[5:],
            }
            tracks[track_id].update(
                {c: set() for c in ["genre", "instrument", "mood/theme"]}
            )
            artist_ids.add(get_id(row[1]))
            albums_ids.add(get_id(row[2]))
            for tag_str in row[5:]:
                category, tag = tag_str.split("---")
                if tag not in tags[category]:
                    tags[category][tag] = set()
                tags[category][tag].add(track_id)
                if category not in tracks[track_id]:
                    tracks[track_id][category] = set()
                tracks[track_id][category].update(set(tag.split(",")))
    print(
        "Reading: {} tracks, {} albums, {} artists".format(
            len(tracks), len(albums_ids), len(artist_ids)
        )
    )
    extra = {
        "track_id_length": get_length(tracks.keys()),
        "artist_id_length": get_length(artist_ids),
        "album_id_length": get_length(albums_ids),
    }
    return tracks, tags, extra


def get_jamendo_data(
    dataset_path: str, num_val: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Train/val path arrays (ref: jamendo.py:90-126)."""
    train_split, _, _ = read_file(
        dataset_path + "data/splits/split-0/autotagging-train.tsv"
    )
    val_split, _, _ = read_file(
        dataset_path + "data/splits/split-0/autotagging-validation.tsv"
    )
    test_split, _, _ = read_file(
        dataset_path + "data/splits/split-0/autotagging-test.tsv"
    )
    train_ids = list(train_split.keys())
    val_ids = list(val_split.keys())
    test_ids = list(test_split.keys())
    random.Random(4).shuffle(val_ids)
    audio_path = dataset_path + "raw_30s/audio/"
    train_paths = []
    val_paths = []
    for key in train_ids:
        train_paths.append(audio_path + train_split[key]["path"])
    for idx, key in enumerate(val_ids):
        if idx < num_val:
            val_paths.append(audio_path + val_split[key]["path"])
        else:
            train_paths.append(audio_path + val_split[key]["path"])
    for key in test_ids:
        train_paths.append(audio_path + test_split[key]["path"])
    return np.array(train_paths), np.array(val_paths)


def get_data_loaders(
    model_duration_seconds: float = DURATION,
    sampling_frequency: int = WAVEFORM_SAMPLING_RATE,
    val_steps: int = VAL_STEPS,
    mono: bool = True,
    batch_size: int = 8,
    run_val: bool = True,
    dataset_path: str = JAMENDO_ROOT,
    pairs: bool = False,
):
    """(train, val) iterators (ref: jamendo.py:129-197).

    Default yields CLEAN batches — augmentation happens on-device in the
    train step. ``pairs=True`` restores the reference's (clean, aug) pair
    iterators (augmented in device batches).
    """
    train_ids, val_ids = get_jamendo_data(dataset_path, num_val=val_steps * batch_size)
    print(f"\nNumber of training tracks: {len(train_ids)}")
    print(f"Number of validation tracks: {len(val_ids)}\n")

    if pairs:
        train = iter(
            AugmentationDataset(
                train_ids,
                sampling_frequency=sampling_frequency,
                mono=mono,
                n_segments=N_SEGMENTS,
                model_duration_seconds=model_duration_seconds,
                buffer_size=TRAIN_BUFFER_SIZE,
                noise_split="train",
                batch_size=batch_size,
            )
        )
        val = iter(
            AugmentationDataset(
                val_ids,
                sampling_frequency=sampling_frequency,
                mono=mono,
                n_segments=1,
                model_duration_seconds=model_duration_seconds,
                buffer_size=VAL_BUFFER_SIZE,
                noise_split="val",
                batch_size=batch_size,
            )
        )
        return train, val

    from musicfpaugment_tpu.data.dataset import SegmentPipeline

    train = iter(
        SegmentPipeline(
            train_ids,
            sampling_frequency,
            duration_s=model_duration_seconds,
            n_segments=N_SEGMENTS,
            batch_size=batch_size,
            buffer_size=TRAIN_BUFFER_SIZE,
        )
    )
    val = iter(
        SegmentPipeline(
            val_ids,
            sampling_frequency,
            duration_s=model_duration_seconds,
            n_segments=1,
            batch_size=batch_size,
            buffer_size=VAL_BUFFER_SIZE,
            seed=4,
        )
    )
    return train, val
