"""Dejavu orchestrator (ref: afp/dejavu/dejavu.py:46-378).

Changes by design: no import-time Demucs checkpoint load (denoiser injected),
pluggable database backend (SQLite default, Postgres for deployment parity),
wav/pkl/npy/array input instead of pkl/mp3, and a batched TPU ingestion path
(:meth:`fingerprint_arrays`) next to the reference's sequential
``fingerprint_directory``.
"""

from __future__ import annotations

import os
import pickle
from hashlib import sha1
from itertools import groupby
from time import time
from typing import Any, Callable, Dict, List, Optional, Tuple, Union

import numpy as np

from musicfpaugment_tpu.afp.dejavu import fingerprint as fp_mod
from musicfpaugment_tpu.afp.dejavu.fingerprint import (
    fingerprint,
    fingerprint_spectrogram_batch,
    generate_hashes,
    peaks_from_mask,
)
from musicfpaugment_tpu.afp.dejavu.sqlite_database import SQLiteDatabase
from musicfpaugment_tpu.afp.dejavu.variables import (
    FINGERPRINTED_CONFIDENCE,
    FINGERPRINTED_HASHES,
    HASHES_MATCHED,
    INPUT_CONFIDENCE,
    INPUT_CONFIDENCE_2,
    INPUT_HASHES,
    OFFSET,
    OFFSET_SECS,
    SONG_ID,
    SONG_NAME,
    TOPN,
)
from musicfpaugment_tpu.data.audio_io import read_wav, resample


def unique_hash(file_path: str, block_size: int = 2**20) -> str:
    """SHA1 of file contents (ref: dejavu.py:45-63)."""
    s = sha1()
    with open(file_path, "rb") as f:
        while True:
            buf = f.read(block_size)
            if not buf:
                break
            s.update(buf)
    return s.hexdigest().upper()


def read(
    filename: Union[str, np.ndarray],
    denoising: bool = False,
    denoising_model: str = "unet",
    wave_denoiser: Optional[Callable] = None,
    sample_rate: int = 8000,
    int16_scale: bool = True,
) -> Tuple[List[np.ndarray], int, str]:
    """Load audio as int16-scaled channels (ref: dejavu.py:66-117):
    pkl/npy/wav/array -> mono at ``sample_rate`` x 32767, optional Demucs
    waveform denoising. Returns (channels, sr, content sha1).

    ``int16_scale=False`` returns the raw float waveform (no x 32767) so
    batched callers can defer scaling until after a batched denoise pass
    and stay bit-identical to this per-file path."""
    if denoising is True:
        assert denoising_model in ["demucs", "unet"]

    if isinstance(filename, np.ndarray):
        audio = filename.astype(np.float32).reshape(-1)
        file_hash = sha1(audio.tobytes()).hexdigest().upper()
        native_sr = sample_rate
    else:
        ext = str(filename).split(".")[-1]
        if ext == "pkl":
            with open(filename, "rb") as f:
                audio = np.asarray(pickle.load(f), np.float32).reshape(-1)
            native_sr = sample_rate
        elif ext == "npy":
            audio = np.load(filename).astype(np.float32).reshape(-1)
            native_sr = sample_rate
        else:
            data, native_sr = read_wav(filename)
            audio = data.mean(axis=0) if data.shape[0] > 1 else data[0]
        file_hash = unique_hash(str(filename))

    if denoising is True and denoising_model == "demucs":
        if wave_denoiser is None:
            raise ValueError("demucs denoising requires wave_denoiser")
        audio = np.asarray(wave_denoiser(audio[None, :]))[0]

    audio = resample(audio, native_sr, sample_rate)
    channels = [audio * 32767.0 if int16_scale else audio]
    return channels, sample_rate, file_hash


class Dejavu:
    """ref: dejavu.py:120-378."""

    def __init__(
        self,
        config: Dict[str, Any],
        settings: Optional[Dict[str, Any]] = None,
        state: str = "set",
        denoising: bool = False,
        denoising_model: Optional[str] = None,
        spec_denoiser: Optional[Callable] = None,
        wave_denoiser: Optional[Callable] = None,
        db=None,
    ):
        self.config = config
        self.settings = dict(settings or fp_mod.DEFAULT_SETTINGS)
        if db is not None:
            self.db = db
        else:
            db_cfg = dict(config.get("database", {}))
            db_type = config.get("database_type", "sqlite")
            if db_type == "postgres":
                from musicfpaugment_tpu.afp.dejavu.postgres_database import (
                    PostgreSQLDatabase,
                )

                self.db = PostgreSQLDatabase(**db_cfg)
            else:
                self.db = SQLiteDatabase(**db_cfg)
        self.denoising = denoising
        self.denoising_model = denoising_model
        self.spec_denoiser = spec_denoiser
        self.wave_denoiser = wave_denoiser
        if self.denoising is True:
            assert self.denoising_model in ["unet", "demucs"]

        if state == "set":
            self.db.setup()
        elif state == "clear":
            self.db.empty()
        self.__load_fingerprinted_audio_hashes()

    def __load_fingerprinted_audio_hashes(self) -> None:
        """ref: dejavu.py:142-153."""
        self.songs = self.db.get_songs()
        self.songhashes_set = set()
        for song in self.songs:
            self.songhashes_set.add(song["file_sha1"])

    # ------------------------------------------------------------ ingest

    def fingerprint_directory(self, path_list: list, nprocesses=None) -> None:
        """Sequential ingestion (ref: dejavu.py:155-219)."""
        for file_name in path_list:
            if (
                isinstance(file_name, str)
                and os.path.exists(file_name)
                and unique_hash(file_name) in self.songhashes_set
            ):
                continue
            song_name, hashes, file_hash = self._fingerprint_worker((file_name, None))
            sid = self.db.insert_song(song_name, file_hash, len(hashes))
            self.db.insert_hashes(sid, list(hashes))
            self.db.set_song_fingerprinted(sid)
            self.__load_fingerprinted_audio_hashes()

    def _fingerprint_worker(self, arguments):
        """ref: dejavu.py:221-236."""
        file_name, _limit = arguments
        song_name, _ext = os.path.splitext(os.path.basename(str(file_name)))
        fingerprints, file_hash = self.get_file_fingerprints(file_name)
        return song_name, fingerprints, file_hash

    def get_file_fingerprints(self, file_name: str):
        """ref: dejavu.py:238-254."""
        channels, fs, file_hash = read(
            file_name, sample_rate=self.settings["samplerate"]
        )
        fingerprints = set()
        for channel in channels:
            hashes = fingerprint(
                channel,
                Fs=fs,
                wsize=self.settings["n_fft"],
                n_hop=self.settings["n_hop"],
                fan_value=self.settings["fan_value"],
                amp_min=self.settings["amp_min"],
            )
            fingerprints |= set(hashes)
        return fingerprints, file_hash

    def fingerprint_arrays(
        self, names: List[str], waveforms: np.ndarray, sample_rate: int = 8000
    ) -> None:
        """Batched TPU ingestion: peak masks for the whole batch in one XLA
        program, hashing + inserts host-side."""
        wavs = np.asarray(waveforms, np.float32) * 32767.0
        _, masks, _ = fingerprint_spectrogram_batch(
            wavs,
            self.settings["samplerate"],
            self.settings["n_fft"],
            self.settings["n_hop"],
            self.settings["amp_min"],
        )
        masks = np.asarray(masks)
        for name, mask, wav in zip(names, masks, waveforms):
            hashes = set(
                generate_hashes(
                    peaks_from_mask(mask), fan_value=self.settings["fan_value"]
                )
            )
            file_hash = sha1(np.asarray(wav, np.float32).tobytes()).hexdigest().upper()
            sid = self.db.insert_song(name, file_hash, len(hashes))
            self.db.insert_hashes(sid, list(hashes))
            self.db.set_song_fingerprinted(sid)
        self.__load_fingerprinted_audio_hashes()

    # ------------------------------------------------------------ query

    def fingerprint_batch(
        self, waveforms: np.ndarray, scaled: bool = False
    ) -> List[List[Tuple[str, int]]]:
        """Batched query fingerprinting: the spectrogram frontend + peak
        detection for the whole (B, T) batch run as one XLA program; SHA1
        hashing stays host-side. ``scaled`` marks inputs already in the
        int16-scaled domain (``read()`` output)."""
        wavs = np.asarray(waveforms, np.float32)
        if not scaled:
            wavs = wavs * 32767.0
        hook = (
            self.spec_denoiser
            if (self.denoising and self.denoising_model == "unet")
            else None
        )
        _, masks, _ = fingerprint_spectrogram_batch(
            wavs,
            self.settings["samplerate"],
            self.settings["n_fft"],
            self.settings["n_hop"],
            self.settings["amp_min"],
            denoiser=hook,
        )
        masks = np.asarray(masks)
        return [
            generate_hashes(
                peaks_from_mask(m), fan_value=self.settings["fan_value"]
            )
            for m in masks
        ]

    def generate_fingerprints(
        self, samples, get_masks: bool = False
    ) -> Tuple[List[Tuple[str, int]], float]:
        """ref: dejavu.py:256-293."""
        Fs = self.settings["samplerate"]
        t = time()
        hook = (
            self.spec_denoiser
            if (self.denoising and self.denoising_model == "unet")
            else None
        )
        if get_masks is True:
            # the masks path takes a filename and applies the full read()
            # (incl. waveform denoising) first — ref: dejavu.py:283-293
            channels, _, _ = read(
                samples,
                denoising=self.denoising,
                denoising_model=self.denoising_model or "unet",
                wave_denoiser=self.wave_denoiser,
                sample_rate=Fs,
            )
            _hashes, peak_mask, specgram = fingerprint(
                channels[0],
                Fs=Fs,
                wsize=self.settings["n_fft"],
                n_hop=self.settings["n_hop"],
                fan_value=self.settings["fan_value"],
                amp_min=self.settings["amp_min"],
                denoising=self.denoising,
                denoising_model=self.denoising_model or "unet",
                denoiser=hook,
                get_masks=True,
            )
            return peak_mask, specgram
        result = fingerprint(
            samples,
            Fs=Fs,
            wsize=self.settings["n_fft"],
            n_hop=self.settings["n_hop"],
            fan_value=self.settings["fan_value"],
            amp_min=self.settings["amp_min"],
            denoising=self.denoising,
            denoising_model=self.denoising_model or "unet",
            denoiser=hook,
            get_masks=False,
        )
        fingerprint_time = time() - t
        return result, fingerprint_time

    def find_matches(self, hashes) -> Tuple[List[Tuple[int, int]], Dict[int, int], float]:
        """ref: dejavu.py:295-310."""
        t = time()
        matches, dedup_hashes = self.db.return_matches(list(hashes))
        return matches, dedup_hashes, time() - t

    def align_matches(
        self,
        matches: List[Tuple[int, int]],
        dedup_hashes: Dict[int, int],
        queried_hashes: int,
        topn: int = TOPN,
    ) -> List[Dict[str, Any]]:
        """Offset-histogram consensus (ref: dejavu.py:312-378, including the
        reference's use of the top song's count for confidence_2 /
        nb_matches_with_offset)."""
        sorted_matches = sorted(matches, key=lambda m: (m[0], m[1]))
        counts = [
            (*key, len(list(group)))
            for key, group in groupby(sorted_matches, key=lambda m: (m[0], m[1]))
        ]
        songs_matches = sorted(
            [
                max(list(group), key=lambda g: g[2])
                for _key, group in groupby(counts, key=lambda count: count[0])
            ],
            key=lambda count: count[2],
            reverse=True,
        )

        songs_result = []
        for song_id, offset, _ in songs_matches[0:topn]:
            song = self.db.get_song_by_id(song_id)
            song_name = song.get(SONG_NAME, None)
            song_hashes = song.get("total_hashes", None)
            nseconds = round(
                float(offset) / self.settings["samplerate"] * self.settings["n_hop"],
                5,
            )
            hashes_matched = dedup_hashes[song_id]
            songs_result.append(
                {
                    SONG_ID: song_id,
                    SONG_NAME: song_name.encode("utf8") if song_name else song_name,
                    INPUT_HASHES: queried_hashes,
                    FINGERPRINTED_HASHES: song_hashes,
                    HASHES_MATCHED: hashes_matched,
                    INPUT_CONFIDENCE: round(hashes_matched / queried_hashes, 2),
                    INPUT_CONFIDENCE_2: round(
                        songs_matches[0][2] / queried_hashes, 2
                    ),
                    "nb_matches_with_offset": songs_matches[0][2],
                    FINGERPRINTED_CONFIDENCE: round(
                        hashes_matched / song_hashes, 2
                    ),
                    OFFSET: offset,
                    OFFSET_SECS: nseconds,
                    "file_sha1": (song.get("file_sha1") or "").encode("utf8"),
                }
            )
        return songs_result
