"""Metadata/split-builder tests with synthetic dataset layouts."""

import json
import os

import numpy as np
import pytest


def _write_jamendo(tmp_path, n_train=6, n_val=4, n_test=3):
    root = tmp_path / "jamendo"
    splits = root / "data" / "splits" / "split-0"
    os.makedirs(splits, exist_ok=True)
    idx = 0

    def rows(n):
        nonlocal idx
        out = []
        for _ in range(n):
            idx += 1
            out.append(
                f"track_{idx:07d}\tartist_{idx % 3:06d}\talbum_{idx % 4:06d}\t"
                f"{idx % 100:02d}/{idx}.mp3\t{30 + idx}.0\tgenre---rock\n"
            )
        return out

    header = "TRACK_ID\tARTIST_ID\tALBUM_ID\tPATH\tDURATION\tTAGS\n"
    for name, n in [("train", n_train), ("validation", n_val), ("test", n_test)]:
        with open(splits / f"autotagging-{name}.tsv", "w") as f:
            f.write(header)
            f.writelines(rows(n))
    return str(root) + "/"


def test_jamendo_read_file_and_split(tmp_path):
    from musicfpaugment_tpu.data.jamendo import get_jamendo_data, read_file

    root = _write_jamendo(tmp_path)
    tracks, tags, extra = read_file(
        root + "data/splits/split-0/autotagging-train.tsv"
    )
    assert len(tracks) == 6
    first = tracks[min(tracks)]
    assert first["path"].endswith(".mp3")
    assert "rock" in tags["genre"]

    # num_val=2: 2 val tracks; remaining 2 val + 3 test fold into train
    train, val = get_jamendo_data(root, num_val=2)
    assert len(val) == 2
    assert len(train) == 6 + 2 + 3
    assert all(p.startswith(root + "raw_30s/audio/") for p in train)


def test_dcase_2017_metadata_and_splits(tmp_path, monkeypatch):
    import musicfpaugment_tpu.data.dcase as dcase

    root = tmp_path / "dcase2017"
    os.makedirs(root, exist_ok=True)
    scenes = ["bus", "park", "metro", "office"]
    with open(root / "meta.txt", "w") as f:
        for i in range(200):
            scene = scenes[i % len(scenes)]
            f.write(f"audio/{scene}_{i}.wav\t{scene}\tloc{i % 7}\n")
    monkeypatch.setattr(dcase, "dcase_2017_dev_path", str(root))

    ds = dcase.NoiseDataset("dcase2017", type="dev")
    assert ds.size == 200
    assert set(ds.get_classes()) == set(scenes)
    ds.drop("scene_label", "metro")
    assert "metro" not in set(ds.get_classes())
    paths = ds.get_file_paths_per_class()
    assert len(paths) == 3
    train, val, test = ds.train_val_test_split(num_val=5, num_test=10)
    for scene in paths:
        assert len(val[scene]) == 5
        assert len(test[scene]) == 10
        assert len(train[scene]) == 50 - 15
        # splits are disjoint
        assert not (set(val[scene]) & set(test[scene]))
        assert not (set(val[scene]) & set(train[scene]))


def test_load_noise_split_roundtrip(tmp_path, monkeypatch):
    import musicfpaugment_tpu.data.dcase as dcase

    monkeypatch.setattr(dcase, "SPLITS_DIR", str(tmp_path))
    data = {"bus": ["a.wav", "b.wav"], "park": ["c.wav"]}
    with open(tmp_path / "train.json", "w") as f:
        json.dump(data, f)
    assert dcase.load_noise_split("train") == data


def test_fma_testset_sampling():
    import pandas as pd

    from musicfpaugment_tpu.testing.fma_preprocessing import TestSet

    rng = np.random.default_rng(0)
    n = 12000  # remove_exceptions pops hardcoded indices up to 7945
    genres = [f"G{i}" for i in range(15)]
    df = pd.DataFrame(
        {
            "file_paths": [f"/fma/{i:06d}.mp3" for i in range(n)],
            "top_genre": rng.choice(genres, size=n),
            "duration": rng.integers(5, 300, size=n),
        }
    )
    ts = TestSet(df)
    ts.remove_short_tracks()
    assert (ts.dataset["duration"] > 12).all()
    samples = ts.sample_queries()
    # genre-balanced: over-900 genres capped at 885
    counts = ts.dataset["top_genre"].value_counts()
    expected = sum(min(int(c), 885) if c > 900 else int(c) for c in counts)
    assert len(samples) == expected
    trimmed = ts.remove_exceptions(list(samples))
    assert len(trimmed) == len(samples) - 6


def test_config_cli_overrides():
    from musicfpaugment_tpu.utils.config import TrainConfig, parse_into

    cfg = parse_into(TrainConfig, ["--model", "demucs", "--batch-size", "32"])
    assert cfg.model == "demucs"
    assert cfg.batch_size == 32
    assert cfg.learning_rate == 1e-3  # default preserved
