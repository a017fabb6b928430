"""FMA-large evaluation-corpus selection.

Counterpart of ref: testing/fma_preprocessing.py — the same *selection
semantics* (these define the paper's 10k-query corpus, so they must match
bit-for-bit), expressed in this project's own structure:

* paths are environment-overridable (``MFPA_FMA_ROOT``, ``MFPA_DATASET_DIR``)
  instead of hardcoded docker mounts;
* the FMA ``tracks.csv`` reader extracts only the two columns this pipeline
  consumes (top genre, duration) rather than re-running the full mdeff/fma
  metadata parse (tags, dates, licenses) the reference vendors;
* selection constants are named at module level and the quirks are explicit:
  a genre with *exactly* 900 tracks is dropped (both comparisons in the
  reference are strict, fma_preprocessing.py:103-110), and the 6 exception
  indices are positions into the shuffled list, popped sequentially
  (fma_preprocessing.py:115-128).

Determinism contract: python RNG seeded 31 is consumed only by the final
shuffle; per-genre subsampling uses pandas ``random_state=42`` — identical
streams to the reference.
"""

from __future__ import annotations

import glob
import os
import random
from typing import List

import pandas as pd

FMA_ROOT = os.environ.get("MFPA_FMA_ROOT", "/workspace/fma")
DATASET_DIR = os.environ.get(
    "MFPA_DATASET_DIR", os.path.join(os.path.dirname(__file__), "dataset")
)

# selection constants (ref: fma_preprocessing.py:96-128)
MIN_DURATION_S = 12  # strict >: 12 s tracks are dropped
GENRE_CAP_THRESHOLD = 900  # strict on both sides: ==900 genres are dropped
GENRE_SAMPLE_SIZE = 885
SHUFFLE_SEED = 31
GENRE_SAMPLE_SEED = 42
EXCEPTION_POSITIONS = (77, 2476, 2979, 3023, 4165, 7945)


def blacklist_paths() -> List[str]:
    """The 198 corrupt/duplicate files excluded from the index
    (vendored asset: testing/dataset/fma_large_to_remove.txt)."""
    path = os.path.join(DATASET_DIR, "fma_large_to_remove.txt")
    if not os.path.exists(path):
        return []
    with open(path) as fh:
        return [os.path.join(FMA_ROOT, line) for line in fh.read().splitlines() if line]


def preprocessing_fma_large() -> List[str]:
    """All fma_large mp3s minus the blacklist (ref: fma_preprocessing.py:10-18)."""
    candidates = glob.glob(os.path.join(FMA_ROOT, "fma_large", "*", "*.mp3"))
    excluded = set(blacklist_paths())
    return [p for p in candidates if p not in excluded]


def track_id_to_path(track_id) -> str:
    """FMA shards files by the first 3 digits of the zero-padded id
    (ref: fma_preprocessing.py:79-81)."""
    tid = str(track_id).zfill(6)
    return f"{FMA_ROOT}/fma_large/{tid[:3]}/{tid}.mp3"


# API-parity alias (the reference calls this get_file_path)
get_file_path = track_id_to_path


def read_track_metadata(tracks_csv: str) -> pd.DataFrame:
    """Columns (top_genre, duration, file_paths) from FMA's two-header
    ``tracks.csv``. Only these feed the corpus selection — the full FMA
    metadata parse (tags/dates/categories, ref: fma_preprocessing.py:21-76)
    is deliberately not reproduced."""
    tracks = pd.read_csv(tracks_csv, index_col=0, header=[0, 1])
    frame = pd.DataFrame(
        {
            "top_genre": tracks[("track", "genre_top")],
            "duration": tracks[("track", "duration")],
        }
    )
    frame["file_paths"] = [track_id_to_path(tid) for tid in frame.index]
    return frame.reset_index(drop=True)


def load(filepath: str) -> pd.DataFrame:
    """Thin parity shim for the reference's ``load`` entry point: genres csv
    passes through; tracks csv returns the reduced metadata frame (see
    :func:`read_track_metadata`)."""
    name = os.path.basename(filepath)
    if "genres" in name:
        return pd.read_csv(filepath, index_col=0)
    if "tracks" in name:
        return read_track_metadata(filepath)
    raise ValueError(f"File {name} cannot be opened.")


class TestSet:
    """Genre-balanced query sampling (ref: fma_preprocessing.py:84-128).

    The list order is part of the determinism contract: genres iterate in
    ``value_counts()`` order (descending count), tracks keep dataframe order
    (small genres) or pandas-sample order (large genres), and the final
    shuffle under seed 31 fixes the positions that ``remove_exceptions``
    pops.
    """

    def __init__(self, dataset: pd.DataFrame) -> None:
        self.dataset = dataset

    def get_samples_per_class(self) -> pd.DataFrame:
        return self.dataset.groupby("top_genre", dropna=False).count()

    def remove_short_tracks(self) -> None:
        self.dataset = self.dataset[self.dataset["duration"] > MIN_DURATION_S]

    def _genre_paths(self, genre: str, count: int) -> List[str]:
        in_genre = self.dataset[self.dataset["top_genre"] == genre]
        if count < GENRE_CAP_THRESHOLD:
            return in_genre["file_paths"].tolist()
        if count > GENRE_CAP_THRESHOLD:
            capped = in_genre.sample(
                n=GENRE_SAMPLE_SIZE, random_state=GENRE_SAMPLE_SEED
            )
            return capped["file_paths"].tolist()
        return []  # exactly-900 quirk: dropped, as in the reference

    def sample_queries(self) -> List[str]:
        random.seed(SHUFFLE_SEED)
        samples: List[str] = []
        for genre, count in self.dataset["top_genre"].value_counts().items():
            samples.extend(self._genre_paths(genre, count))
        random.shuffle(samples)
        return samples

    def remove_exceptions(self, samples: List[str]) -> List[str]:
        for position in EXCEPTION_POSITIONS:
            samples.pop(position)
        return samples


def main() -> None:
    """Join genre/duration metadata onto the preprocessed path list and write
    ``fma_large_preprocessed.csv`` (ref: fma_preprocessing.py:131-156)."""
    metadata = read_track_metadata(os.path.join(FMA_ROOT, "fma_metadata", "tracks.csv"))
    paths = pd.read_csv(
        os.path.join(DATASET_DIR, "fma_large_preprocessed.txt"), header=None
    ).rename(columns={0: "file_paths"})
    joined = paths.merge(metadata, on="file_paths", how="left")
    joined.to_csv(os.path.join(DATASET_DIR, "fma_large_preprocessed.csv"), index=False)


if __name__ == "__main__":
    main()
