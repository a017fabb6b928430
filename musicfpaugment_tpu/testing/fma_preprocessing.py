"""FMA-large evaluation-set preprocessing (ref: testing/fma_preprocessing.py).

Paths are environment-overridable (MFPA_FMA_ROOT, MFPA_DATASET_DIR) so the
harness runs outside the reference's docker mounts. The selection logic —
blacklist removal, genre-balanced sampling with seeds 31/42, >12 s duration
filter, hardcoded exception indices — is kept verbatim for query-set parity.
"""

from __future__ import annotations

import ast
import glob
import os
import random
from typing import List

import pandas as pd

FMA_ROOT = os.environ.get("MFPA_FMA_ROOT", "/workspace/fma")
DATASET_DIR = os.environ.get(
    "MFPA_DATASET_DIR", os.path.join(os.path.dirname(__file__), "dataset")
)


def preprocessing_fma_large() -> List[str]:
    """Glob fma_large minus the 198-file blacklist
    (ref: fma_preprocessing.py:10-18)."""
    test_mp3s = glob.glob(FMA_ROOT + "/fma_large/*/*.mp3", recursive=True)
    blacklist_path = os.path.join(DATASET_DIR, "fma_large_to_remove.txt")
    mp3s_to_remove: List[str] = []
    if os.path.exists(blacklist_path):
        with open(blacklist_path) as text_file:
            mp3s_to_remove = [
                FMA_ROOT + "/" + p for p in text_file.read().split("\n") if p
            ]
    remove_set = set(mp3s_to_remove)
    return [m for m in test_mp3s if m not in remove_set]


def load(filepath: str) -> pd.DataFrame:
    """FMA metadata csv loader (ref: fma_preprocessing.py:21-76)."""
    filename = os.path.basename(filepath)
    if "genres" in filename:
        return pd.read_csv(filepath, index_col=0)
    elif "tracks" in filename:
        tracks = pd.read_csv(filepath, index_col=0, header=[0, 1])
        for column in [
            ("track", "tags"),
            ("album", "tags"),
            ("artist", "tags"),
            ("track", "genres"),
            ("track", "genres_all"),
        ]:
            tracks[column] = tracks[column].map(ast.literal_eval)
        for column in [
            ("track", "date_created"),
            ("track", "date_recorded"),
            ("album", "date_created"),
            ("album", "date_released"),
            ("artist", "date_created"),
            ("artist", "active_year_begin"),
            ("artist", "active_year_end"),
        ]:
            tracks[column] = pd.to_datetime(tracks[column])
        subsets = ("small", "medium", "large")
        tracks["set", "subset"] = tracks["set", "subset"].astype(
            pd.CategoricalDtype(categories=subsets, ordered=True)
        )
        for column in [
            ("track", "genre_top"),
            ("track", "license"),
            ("album", "type"),
            ("album", "information"),
            ("artist", "bio"),
        ]:
            tracks[column] = tracks[column].astype("category")
        return tracks
    raise ValueError(f"File {filename} cannot be opened.")


def get_file_path(input_str: str) -> str:
    """track id -> fma_large shard path (ref: fma_preprocessing.py:79-81)."""
    input_str = str(input_str).zfill(6)
    return f"{FMA_ROOT}/fma_large/{input_str[:3]}/{input_str}.mp3"


class TestSet:
    """Genre-balanced query sampling (ref: fma_preprocessing.py:84-128)."""

    def __init__(self, dataset: pd.DataFrame) -> None:
        self.dataset = dataset

    def get_samples_per_class(self) -> pd.DataFrame:
        return self.dataset.groupby("top_genre", dropna=False).count()

    def remove_short_tracks(self) -> None:
        self.dataset = self.dataset[self.dataset["duration"] > 12]

    def sample_queries(self) -> List[str]:
        random.seed(31)
        result = self.dataset["top_genre"].value_counts()
        samples: List[str] = []
        for genre, count in result.items():
            if count < 900:
                files = self.dataset[self.dataset["top_genre"] == genre]
                samples.extend(files["file_paths"].tolist())
            if count > 900:
                files = self.dataset[self.dataset["top_genre"] == genre].sample(
                    n=885, random_state=42
                )
                samples.extend(files["file_paths"].tolist())
        random.shuffle(samples)
        return samples

    def remove_exceptions(self, samples: List[str]) -> List[str]:
        samples_to_remove = [77, 2476, 2979, 3023, 4165, 7945]
        for index in samples_to_remove:
            samples.pop(index)
        return samples


def main() -> None:
    """Build fma_large_preprocessed.csv (ref: fma_preprocessing.py:131-156)."""
    tracks = load(f"{FMA_ROOT}/fma_metadata/tracks.csv")
    genre_data_csv = tracks["track"][["genre_top", "duration"]]
    genre_dataset = pd.DataFrame(
        {
            "track_id": genre_data_csv.index,
            "top_genre": genre_data_csv.genre_top,
            "duration": genre_data_csv.duration,
        }
    )
    genre_dataset["file_paths"] = genre_dataset["track_id"].apply(get_file_path)
    genre_dataset.drop(columns=["track_id"], inplace=True)

    preprocessed_fma = pd.read_csv(
        os.path.join(DATASET_DIR, "fma_large_preprocessed.txt"), header=None
    )
    preprocessed_fma = preprocessed_fma.rename(columns={0: "file_paths"})
    final_dataset = preprocessed_fma.merge(genre_dataset, on="file_paths", how="left")
    final_dataset.to_csv(
        os.path.join(DATASET_DIR, "fma_large_preprocessed.csv"), index=False
    )


if __name__ == "__main__":
    main()
