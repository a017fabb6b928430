"""Audfprint analyzer facade — single-file API parity + batched TPU path.

Counterpart of ``Audfprint_peaks`` (ref: afp/audfprint/peak_extractor.py:76-
481), with two deliberate changes:

* no module-import-time checkpoint loading (the reference loads UNet+Demucs
  globally at import, peak_extractor.py:24-37) — denoisers are injected as
  callables;
* the hot path is batched: :meth:`peaks_batch` / :meth:`hashes_batch` process
  whole query batches in one XLA program (vmapped scan kernel), while
  ``find_peaks`` / ``wavfile2peaks`` / ``wavfile2hashes`` keep the reference's
  one-file signatures for drop-in use.
"""

from __future__ import annotations

import functools
import pickle
from typing import Any, Callable, Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from musicfpaugment_tpu.afp.audfprint import landmarks as lm
from musicfpaugment_tpu.afp.audfprint.hash_table import HashTable
from musicfpaugment_tpu.afp.audfprint.peaks import (
    find_peaks_batch,
    spectrogram_frontend,
)
from musicfpaugment_tpu.data.audio_io import read_wav, resample


def pad_waveform_batch(
    waveforms, n_fft: int = 512, pad_to: Optional[int] = None
) -> Tuple[np.ndarray, np.ndarray]:
    """Stack mixed-length 1-D waveforms into one (B, T) batch.

    Each waveform is extended by ``n_fft // 2`` *reflected* samples (the
    values the STFT's centered reflect padding reads past the signal end,
    core/stft.py:66-67) and then zeros, so frames of the padded batch whose
    index is below the per-example valid count are bit-identical to the
    unpadded computation. Returns (batch, valid_samples) where
    ``valid_samples[b]`` is the original length; feed it to
    ``hashes_batch`` / ``DeviceMatcher.match_waveforms`` as ``valid_samples``
    (they derive per-shift valid frame counts from it).
    """
    half = n_fft // 2
    lens = [int(np.asarray(w).shape[-1]) for w in waveforms]
    for L in lens:
        if L <= half:
            raise ValueError(
                f"waveform of {L} samples is shorter than n_fft/2={half}; "
                "mixed-length batching needs a reflectable tail"
            )
    T = pad_to if pad_to is not None else max(lens)
    out = np.zeros((len(lens), T + half), np.float32)
    for i, w in enumerate(waveforms):
        w = np.asarray(w, np.float32).reshape(-1)
        L = lens[i]
        out[i, :L] = w
        out[i, L : L + half] = w[-2 : -2 - half : -1]
    return out, np.asarray(lens, np.int32)


def valid_frames_for(
    valid_samples, shift_samples: int = 0, n_fft: int = 512, n_hop: int = 256
):
    """Per-example valid frame count of a centered STFT over the first
    ``valid_samples - shift_samples`` samples: ``1 + floor(L / n_hop)``
    (core/stft.py:41 after the n_fft//2 reflect pad on both sides)."""
    del n_fft  # centered: pad cancels the window length
    return 1 + (valid_samples - shift_samples) // n_hop


class AudfprintPeaks:
    """Analysis of waveforms into hash constellations
    (ref: peak_extractor.py:76-113 for the parameter meanings)."""

    def __init__(
        self,
        params: Dict[str, Any],
        denoising: bool = False,
        denoising_model: Optional[str] = None,
        spec_denoiser: Optional[Callable] = None,
        wave_denoiser: Optional[Callable] = None,
    ) -> None:
        self.density = params["density"]
        self.target_sr = params["samplerate"]
        self.n_fft = params["n_fft"]
        self.n_hop = params["n_hop"]
        self.shifts = params["shifts"]
        self.f_sd = params["freq-sd"]
        self.maxpksperframe = params["pks-per-frame"]
        self.maxpairsperpeak = lm.MAXPAIRSPERPEAK
        self.mindt = lm.MINDT
        self.targetdt = lm.TARGETDT
        self.targetdf = lm.TARGETDF
        self.denoising = denoising
        self.denoising_model = denoising_model
        if self.denoising:
            assert self.denoising_model in ["demucs", "unet"]
            if denoising_model == "unet" and spec_denoiser is None:
                raise ValueError("unet denoising requires spec_denoiser")
            if denoising_model == "demucs" and wave_denoiser is None:
                raise ValueError("demucs denoising requires wave_denoiser")
        self.spec_denoiser = spec_denoiser
        self.wave_denoiser = wave_denoiser
        self.soundfiledur = 0.0
        self._jit_cache: Dict[Tuple[int, ...], Callable] = {}

    # ------------------------------------------------------------ batched

    def _spec_hook(self):
        if self.denoising and self.denoising_model == "unet":
            return self.spec_denoiser
        return None

    def peaks_batch(
        self, waveforms: np.ndarray, valid_frames: Optional[np.ndarray] = None
    ) -> jnp.ndarray:
        """(B, T) waveforms -> (B, n_fft//2, frames) boolean peak masks.
        One jitted XLA program per waveform length. ``valid_frames`` marks
        per-example real frame counts for mixed-length padded batches
        (see :func:`pad_waveform_batch`)."""
        waveforms = jnp.asarray(waveforms, jnp.float32)
        if self.denoising and self.denoising_model == "demucs":
            waveforms = self.wave_denoiser(waveforms)
        key = ("peaks", waveforms.shape[-1], valid_frames is not None)
        if key not in self._jit_cache:
            hook = self._spec_hook()

            def fn(w, vf):
                return find_peaks_batch(
                    w,
                    density=self.density,
                    n_fft=self.n_fft,
                    n_hop=self.n_hop,
                    f_sd=self.f_sd,
                    maxpksperframe=self.maxpksperframe,
                    denoiser=hook,
                    valid_frames=vf,
                )

            self._jit_cache[key] = jax.jit(fn)
        vf = None if valid_frames is None else jnp.asarray(valid_frames, jnp.int32)
        return self._jit_cache[key](waveforms, vf)

    def _hashes_from_masks_device(self, masks: jnp.ndarray):
        """(B, F, C) peak masks -> ((B, max_hashes, 2) int32, (B, max_hashes)
        bool) via the batched device hasher (landmarks.hashes_from_mask
        vmapped) — replaces the per-example host pairing loop, the dominant
        cost of the end-to-end match path."""
        C = int(masks.shape[-1])
        # static pads: <= maxpksperframe peaks per column, 3 pairs per peak
        max_peaks = -(-self.maxpksperframe * C // 128) * 128
        max_hashes = max_peaks * lm.MAXPAIRSPERPEAK
        key = ("hashes", masks.shape[1:], max_peaks)
        if key not in self._jit_cache:
            fn = functools.partial(
                lm.hashes_from_masks_batched,
                max_peaks=max_peaks,
                max_hashes=max_hashes,
            )
            self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key](masks)

    def hashes_batch(
        self,
        waveforms: np.ndarray,
        shifts: Optional[int] = None,
        device_hashing: bool = True,
        valid_samples: Optional[np.ndarray] = None,
    ) -> List[np.ndarray]:
        """(B, T) waveforms -> list of B (N_i, 2) unique (time, hash) arrays.

        Shifted analysis (frame-effect reduction, peak_extractor.py:406-415)
        reuses the batch: shift s drops ``int(s / shifts * n_hop)`` leading
        samples. Peak pairing + hash packing run on device for the whole
        batch (``device_hashing=False`` restores the host oracle loop);
        cross-shift dedup stays a cheap host ``np.unique``.

        ``valid_samples`` (B,) marks per-example real lengths when the batch
        was stacked by :func:`pad_waveform_batch` — padded columns then
        produce no peaks/hashes, matching per-file processing.
        """
        waveforms = np.asarray(waveforms, np.float32)
        shifts = shifts if shifts is not None else self.shifts
        n_shifts = max(1, shifts)
        per_shift = []  # per shift: (B,) list of (N, 2) arrays
        for shift in range(n_shifts):
            shiftsamps = int(shift / n_shifts * self.n_hop)
            vf = (
                None
                if valid_samples is None
                else valid_frames_for(
                    np.asarray(valid_samples, np.int64), shiftsamps,
                    self.n_fft, self.n_hop,
                ).astype(np.int32)
            )
            masks = self.peaks_batch(waveforms[:, shiftsamps:], valid_frames=vf)
            if device_hashing:
                th, valid = jax.device_get(self._hashes_from_masks_device(masks))
                per_shift.append([t[v] for t, v in zip(th, valid)])
            else:
                m = np.asarray(masks)
                per_shift.append(
                    [lm.hashes_from_mask_np(m[b]) for b in range(m.shape[0])]
                )
        B = waveforms.shape[0]
        out = []
        for b in range(B):
            allh = np.concatenate([s[b] for s in per_shift], axis=0)
            if allh.shape[0] == 0:
                out.append(allh.astype(np.int32).reshape(0, 2))
                continue
            packed = (allh[:, 0].astype(np.uint64) << np.uint64(32)) + allh[
                :, 1
            ].astype(np.uint64)
            uniq = np.sort(np.unique(packed))
            out.append(
                np.stack(
                    [uniq >> np.uint64(32), uniq & np.uint64(0xFFFFFFFF)], axis=1
                ).astype(np.int32)
            )
        return out

    # ------------------------------------------------------------ parity API

    def spreadpeaks(self, peaks, npoints=None, width: float = 4.0, base=None):
        """Max of Gaussian bumps at (index, value) peaks
        (ref: peak_extractor.py:127-171)."""
        if base is None and npoints is not None:
            vec = np.zeros(npoints, dtype=np.float32)
        elif base is not None:
            npoints = len(base)
            vec = np.copy(base)
        else:
            raise ValueError("Please provide arguments npoints or base!")
        idx = np.arange(npoints)
        for pos, val in peaks:
            vec = np.maximum(
                vec, val * np.exp(-0.5 * ((idx - pos) / width) ** 2)
            )
        return vec

    def spreadpeaksinvector(self, vector, width: float = 4.0):
        """ref: peak_extractor.py:115-125."""
        npts = len(vector)
        peaks = locmax(vector, indices=True)
        return self.spreadpeaks(
            [(p, v) for p, v in zip(peaks, vector[peaks])],
            npoints=npts, width=width,
        )

    def find_peaks(self, d: np.ndarray):
        """Single-waveform peak extraction; returns (pklist, peaks_mask, spec)
        like the reference (peak_extractor.py:236-311)."""
        d = np.asarray(d, np.float32).reshape(-1)
        if len(d) == 0:
            return [], np.array([]), np.array([])
        dj = jnp.asarray(d)[None, :]
        spec = np.asarray(
            spectrogram_frontend(dj, self.n_fft, self.n_hop, self._spec_hook())
        )[0]
        mask = np.asarray(self.peaks_batch(d[None, :]))[0]
        cols, bins = np.nonzero(mask.T)  # column-major order
        pklist = list(zip(cols.tolist(), bins.tolist()))
        return pklist, mask.astype(np.float32), spec

    def _load(self, filename: Union[str, np.ndarray]) -> np.ndarray:
        if isinstance(filename, np.ndarray):
            return filename.astype(np.float32).reshape(-1)
        ext = str(filename).split(".")[-1]
        if ext == "pkl":
            with open(filename, "rb") as f:
                d = np.asarray(pickle.load(f), np.float32).reshape(-1)
            from musicfpaugment_tpu.testing.parameters import (
                WAVEFORM_SAMPLING_RATE,
            )

            return resample(d, WAVEFORM_SAMPLING_RATE, self.target_sr)
        if ext == "npy":
            return np.load(filename).astype(np.float32).reshape(-1)
        data, sr = read_wav(filename)
        mono = data.mean(axis=0) if data.shape[0] > 1 else data[0]
        return resample(mono, sr, self.target_sr)

    def wavfile2peaks(
        self,
        filename: Union[str, np.ndarray],
        shifts: Optional[int] = None,
        get_masks_waveforms: bool = False,
    ):
        """ref: peak_extractor.py:348-424 (pkl/npy/wav instead of pkl/mp3).

        With ``get_masks_waveforms`` returns (peaks_mask, waveform, sgram)
        like the reference (:420-421), used by the peaks-metrics harness."""
        d = self._load(filename)
        if self.denoising and self.denoising_model == "demucs":
            d = np.asarray(self.wave_denoiser(jnp.asarray(d)[None, :]))[0]
        self.soundfiledur = len(d) / self.target_sr
        if get_masks_waveforms:
            _, mask, sgram = self.find_peaks(d)
            return mask, d, sgram
        if shifts is None or shifts < 2:
            peaks, _, _ = self.find_peaks(d)
            return peaks
        peaklists = []
        for shift in range(shifts):
            shiftsamps = int(shift / self.shifts * self.n_hop)
            peaklists.append(self.find_peaks(d[shiftsamps:])[0])
        return peaklists

    def peaks2landmarks(self, pklist):
        """ref: peak_extractor.py:313-346 — retained for API parity; the
        batched path packs hashes directly from masks."""
        landmarks = []
        if len(pklist) > 0:
            scols = pklist[-1][0] + 1
            peaks_at: List[List[int]] = [[] for _ in range(scols)]
            for col, bin_ in pklist:
                peaks_at[col].append(bin_)
            for col in range(scols):
                for peak in peaks_at[col]:
                    pairsthispeak = 0
                    for col2 in range(col + self.mindt, min(scols, col + self.targetdt)):
                        if pairsthispeak >= self.maxpairsperpeak:
                            break
                        for peak2 in peaks_at[col2]:
                            if abs(peak2 - peak) < self.targetdf:
                                if pairsthispeak < self.maxpairsperpeak:
                                    landmarks.append((col, peak, peak2, col2 - col))
                                    pairsthispeak += 1
        return landmarks

    def wavfile2hashes(self, filename: Union[str, np.ndarray]) -> np.ndarray:
        """ref: peak_extractor.py:426-460."""
        d = self._load(filename)
        if self.denoising and self.denoising_model == "demucs":
            d = np.asarray(self.wave_denoiser(jnp.asarray(d)[None, :]))[0]
        self.soundfiledur = len(d) / self.target_sr
        return self.hashes_batch(d[None, :], shifts=self.shifts)[0]

    def ingest(self, hashtable: HashTable, filename: str) -> Tuple[float, int]:
        """ref: peak_extractor.py:462-481."""
        hashes = self.wavfile2hashes(filename)
        hashtable.store(filename, hashes)
        return self.soundfiledur, len(hashes)

    def ingest_batch(
        self,
        hashtable: HashTable,
        names: List[str],
        waveforms: np.ndarray,
        shifts: Optional[int] = 1,
        valid_samples: Optional[np.ndarray] = None,
    ) -> int:
        """Batched ingestion: peaks+hashes for the whole batch on TPU, then a
        vectorized store per track. ``valid_samples`` supports mixed-length
        batches stacked by :func:`pad_waveform_batch`."""
        all_hashes = self.hashes_batch(
            waveforms, shifts=shifts, valid_samples=valid_samples
        )
        total = 0
        for name, hashes in zip(names, all_hashes):
            hashtable.store(name, hashes)
            total += len(hashes)
        return total


def locmax(vec: np.ndarray, indices: bool = False):
    """Local maxima with end-point semantics (ref: peak_extractor.py:61-73)."""
    nbr = np.zeros(len(vec) + 1, dtype=bool)
    nbr[0] = True
    nbr[1:-1] = np.greater_equal(vec[1:], vec[:-1])
    maxmask = nbr[:-1] & ~nbr[1:]
    if indices:
        return np.nonzero(maxmask)[0]
    return maxmask


# Backwards-compatible alias matching the reference class name
Audfprint_peaks = AudfprintPeaks


def landmarks2hashes(landmarks_list):
    """ref: peak_extractor.py:40-58 — numpy hash packing for API parity."""
    landmarks = np.array(landmarks_list)
    if landmarks.shape[0] == 0:
        return np.zeros((0, 2), dtype=np.int32)
    hashes = np.zeros((landmarks.shape[0], 2), dtype=np.int32)
    hashes[:, 0] = landmarks[:, 0]
    hashes[:, 1] = (
        ((landmarks[:, 1] & 255) << 12)
        | (((landmarks[:, 2] - landmarks[:, 1]) & 63) << 6)
        | (landmarks[:, 3] & 63)
    )
    return hashes
