"""Dejavu fingerprinting: max-filter peak picking on TPU + SHA1 hashing.

Counterpart of ref: afp/dejavu/fingerprint.py:34-213. The scipy
``maximum_filter`` / ``binary_erosion`` peak detector maps directly onto two
XLA ``reduce_window`` ops (max with -inf padding; AND with True padding) —
batched over queries and fused with the spectrogram frontend. Hash generation
(SHA1 of "f1|f2|dt") stays host-side (cryptographic hashing has no business
on an MXU); a packed-integer hash variant is available for fully-device
pipelines (``pack_hashes``).

No module-import-time checkpoint loading (the reference loads a UNet globally
at import, fingerprint.py:27-31) — the denoiser is an injected callable.
"""

from __future__ import annotations

import functools
import hashlib
from operator import itemgetter
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from musicfpaugment_tpu.afp.dejavu.variables import (
    CONNECTIVITY_MASK,
    FINGERPRINT_REDUCTION,
    MAX_HASH_TIME_DELTA,
    MIN_HASH_TIME_DELTA,
    PEAK_NEIGHBORHOOD_SIZE,
)
from musicfpaugment_tpu.core.stft import frame

Array = jnp.ndarray

DEFAULT_SETTINGS = {
    "samplerate": 8000,
    "n_fft": 512,
    "n_hop": 256,
    "fan_value": 3,
    "amp_min": 50,
    "peak_neighb_size": PEAK_NEIGHBORHOOD_SIZE,
}


@functools.lru_cache(maxsize=None)
def _sym_hann(n: int) -> np.ndarray:
    """matplotlib ``mlab.window_hanning`` — symmetric np.hanning."""
    return np.hanning(n).astype(np.float32)


def specgram_psd(
    signal: Array, fs: float = 8000, n_fft: int = 512, noverlap: int = 256
) -> Array:
    """``mlab.specgram`` one-sided PSD semantics (ref: fingerprint.py:60-66):
    symmetric Hann, no center padding, |rfft|^2 / (fs * sum(win^2)), non-DC/
    non-Nyquist bins doubled. Returns (..., n_fft//2 + 1, frames)."""
    win = jnp.asarray(_sym_hann(n_fft))
    hop = n_fft - noverlap
    frames = frame(signal, n_fft, hop)
    spec = jnp.fft.rfft(frames * win, n=n_fft, axis=-1)
    psd = (jnp.abs(spec) ** 2) / (fs * float(np.sum(_sym_hann(n_fft) ** 2)))
    scale = np.full(n_fft // 2 + 1, 2.0, np.float32)
    scale[0] = 1.0
    scale[-1] = 1.0
    psd = psd * jnp.asarray(scale)
    return jnp.swapaxes(psd, -1, -2)


def _square_footprint_size(neighborhood: int, connectivity: int) -> int:
    """``iterate_structure(generate_binary_structure(2, 2), n)`` is the full
    (2n+1)x(2n+1) square for connectivity 2 (ref: fingerprint.py:107-125)."""
    assert connectivity == 2, "only the square (connectivity-2) mask is used"
    return 2 * neighborhood + 1


def detect_peaks_mask(
    arr: Array,
    amp_min: float = 50.0,
    neighborhood: int = PEAK_NEIGHBORHOOD_SIZE,
    connectivity: int = CONNECTIVITY_MASK,
) -> Array:
    """Boolean peak mask for (..., F, C) log spectrograms
    (ref: get_2D_peaks, fingerprint.py:94-171).

    local_max: value equals the max of its (2n+1)^2 square window (scipy
    maximum_filter; -inf window padding is equivalent to scipy's reflect mode
    for the equality test). eroded_background: all-background windows with
    border_value=1 (AND reduce_window padded True). Peaks = local_max XOR
    eroded, amplitude-filtered.
    """
    k = _square_footprint_size(neighborhood, connectivity)
    nbatch = arr.ndim - 2
    strides = (1,) * arr.ndim

    def _sep(x, init, op):
        # The square footprint is a Cartesian product, and max / AND are
        # associative + commutative, so the 2-D window factors exactly into
        # two 1-D passes (k + k taps instead of k*k) — bit-identical output,
        # dramatically cheaper XLA-TPU codegen/compile for k=21.
        for axis in (arr.ndim - 2, arr.ndim - 1):
            window = tuple(k if i == axis else 1 for i in range(arr.ndim))
            pads = tuple(
                (k // 2, k // 2) if i == axis else (0, 0)
                for i in range(arr.ndim)
            )
            x = jax.lax.reduce_window(x, init, op, window, strides, pads)
        return x

    local_max = _sep(arr, -jnp.inf, jax.lax.max) == arr
    background = arr == 0
    eroded = _sep(background, True, jnp.logical_and)
    detected = local_max != eroded
    return detected & (arr > amp_min)


def fingerprint_spectrogram_batch(
    waveforms: Array,
    fs: float = 8000,
    wsize: int = 512,
    n_hop: int = 256,
    amp_min: float = 50.0,
    denoiser: Optional[Callable[[Array], Array]] = None,
):
    """(B, T) waveforms -> (log spectrograms (B, F, C), peak masks (B, F, C),
    normalized PSD spectrograms). One jittable program for the whole batch.

    Pipeline (ref: fingerprint.py:56-85): PSD specgram -> /max -> [UNet
    denoise then square] -> 10*log(max(a, max/1e6)) - mean -> peak detect.
    """
    arr2d = specgram_psd(waveforms, fs, wsize, wsize - n_hop)
    denom = jnp.max(arr2d, axis=(-2, -1), keepdims=True)
    arr2d = arr2d / jnp.maximum(denom, jnp.finfo(arr2d.dtype).tiny)
    if denoiser is not None:
        arr2d = denoiser(arr2d) ** 2  # ref: fingerprint.py:70-75
    specgram = arr2d
    amax = jnp.max(arr2d, axis=(-2, -1), keepdims=True)
    logd = 10.0 * jnp.log(jnp.maximum(arr2d, amax / 1e6))
    logd = logd - jnp.mean(logd, axis=(-2, -1), keepdims=True)
    mask = detect_peaks_mask(logd, amp_min=amp_min)
    return logd, mask, specgram


def get_2D_peaks(
    arr2D,
    plot: bool = False,
    amp_min: float = 50,
) -> Tuple[List[Tuple[int, int]], np.ndarray]:
    """Single-spectrogram peak extraction, reference signature
    (ref: fingerprint.py:94-171): returns ([(freq, time), ...], mask)."""
    arr = jnp.asarray(np.asarray(arr2D, np.float32))
    mask = np.asarray(detect_peaks_mask(arr, amp_min=amp_min))
    return peaks_from_mask(mask), mask.astype(np.float64)


def peaks_from_mask(mask: np.ndarray) -> List[Tuple[int, int]]:
    """(F, C) mask -> [(freq, time), ...] in np.where order
    (ref: fingerprint.py:140-152)."""
    freqs, times = np.nonzero(mask)
    return list(zip(freqs.tolist(), times.tolist()))


def generate_hashes(
    peaks: List[Tuple[int, int]], fan_value: int = 3
) -> List[Tuple[str, int]]:
    """SHA1 landmark hashes (ref: fingerprint.py:174-213)."""
    idx_freq = 0
    idx_time = 1
    peaks = list(peaks)
    peaks.sort(key=itemgetter(1))
    hashes = []
    for i in range(len(peaks)):
        for j in range(1, fan_value):
            if (i + j) < len(peaks):
                freq1 = peaks[i][idx_freq]
                freq2 = peaks[i + j][idx_freq]
                t1 = peaks[i][idx_time]
                t2 = peaks[i + j][idx_time]
                t_delta = t2 - t1
                if MIN_HASH_TIME_DELTA <= t_delta <= MAX_HASH_TIME_DELTA:
                    h = hashlib.sha1(
                        f"{str(freq1)}|{str(freq2)}|{str(t_delta)}".encode("utf-8")
                    )
                    hashes.append((h.hexdigest()[0:FINGERPRINT_REDUCTION], t1))
    return hashes


def pack_hashes(
    peaks: List[Tuple[int, int]], fan_value: int = 3
) -> List[Tuple[int, int]]:
    """Integer-packed variant of :func:`generate_hashes` for fully-device
    pipelines: (f1 << 17) | (f2 << 8) | dt fits 26 bits (f <= 256, dt <= 200).
    Behind a flag — the SHA1 path is the compatibility default."""
    peaks = sorted(peaks, key=itemgetter(1))
    out = []
    for i in range(len(peaks)):
        for j in range(1, fan_value):
            if (i + j) < len(peaks):
                f1, t1 = peaks[i]
                f2, t2 = peaks[i + j]
                dt = t2 - t1
                if MIN_HASH_TIME_DELTA <= dt <= MAX_HASH_TIME_DELTA:
                    out.append(((int(f1) << 17) | (int(f2) << 8) | int(dt), t1))
    return out


def pack_hashes_from_masks(
    masks: Array, max_peaks: int, fan_value: int = 3
) -> Tuple[Array, Array, Array, Array, Array, Array]:
    """Device-side, batched :func:`pack_hashes`: (B, F, C) peak masks ->
    deduped packed query hashes, entirely inside one XLA program.

    Peak ordering replicates the host path exactly (ref:
    fingerprint.py:140-152 + the stable time-sort in generate_hashes,
    fingerprint.py:174-213): ``np.nonzero`` emits freq-major order and the
    stable sort by time yields (time, freq)-ascending — here the mask is
    transposed to (C, F) and compacted row-major, which is the same order.
    Each peak pairs with its ``fan_value - 1`` successors; pairs with
    ``MIN_HASH_TIME_DELTA <= dt <= MAX_HASH_TIME_DELTA`` become the
    injective 26-bit key ``(f1 << 17) | (f2 << 8) | dt`` — a bijection of
    the (f1, f2, dt) triple the SHA1 string encodes, so match sets are
    identical to the hex-hash path.

    The output is deduplicated by (key, t1) — the ``set(fingerprints)``
    in both ingestion (dejavu.py ``get_file_fingerprints``) and query
    (``BaseRecognizer._recognize``) — via one 2-key sort; invalid slots
    sort to the back.

    Returns ``(keys, t1, valid, key_first, n_distinct, n_peak_overflow)``:
    (B, H = max_peaks * (fan_value - 1)) arrays sorted by (key, t1);
    ``key_first`` marks the first occurrence of each distinct key (the
    unit ``return_matches`` counts ``dedup_hashes`` in — one per fetched
    DB row, not per query offset); ``n_distinct`` is the per-query count
    of deduped hashes; ``n_peak_overflow`` counts queries whose peaks
    exceeded ``max_peaks`` (truncated earliest-first, fail-loud).
    """
    from musicfpaugment_tpu.afp.audfprint.landmarks import compact_valid_first

    B, F, C = masks.shape
    # Injectivity guard: the 26-bit key (f1 << 17) | (f2 << 8) | dt only
    # encodes f2 < 512 and dt < 256 without overlap. Defaults (n_fft=512 ->
    # F=257, MAX_HASH_TIME_DELTA=200) are safe, but a caller-supplied larger
    # n_fft would silently produce colliding keys and wrong match sets.
    if F > 512:
        raise ValueError(
            f"packed dejavu keys require <= 512 frequency bins, got {F} "
            "(n_fft too large for the 26-bit key layout)"
        )
    if MAX_HASH_TIME_DELTA > 255:
        raise ValueError(
            "packed dejavu keys require MAX_HASH_TIME_DELTA <= 255, got "
            f"{MAX_HASH_TIME_DELTA}"
        )
    m = jnp.swapaxes(masks, -1, -2).reshape(B, C * F)  # row-major = (t, f)
    flat = jnp.arange(C * F, dtype=jnp.int32)
    tpos = jnp.broadcast_to((flat // F)[None, :], (B, C * F))
    fpos = jnp.broadcast_to((flat % F)[None, :], (B, C * F))
    pt, pf, npk = compact_valid_first(tpos, fpos, m, out_len=max_peaks)
    n_peak_overflow = jnp.sum(npk > max_peaks)
    vpk = jnp.arange(max_peaks)[None, :] < jnp.minimum(npk, max_peaks)[:, None]

    key_parts, t_parts, ok_parts = [], [], []
    for j in range(1, fan_value):
        f2 = jnp.concatenate([pf[:, j:], jnp.zeros((B, j), pf.dtype)], axis=1)
        t2 = jnp.concatenate([pt[:, j:], jnp.zeros((B, j), pt.dtype)], axis=1)
        v2 = jnp.concatenate([vpk[:, j:], jnp.zeros((B, j), bool)], axis=1)
        dt = t2 - pt  # >= 0 by (t, f)-ascending peak order
        ok = (
            vpk
            & v2
            & (dt >= MIN_HASH_TIME_DELTA)
            & (dt <= MAX_HASH_TIME_DELTA)
        )
        key_parts.append(
            jnp.where(ok, (pf << 17) | (f2 << 8) | dt, jnp.int32(1 << 30))
        )
        t_parts.append(pt)
        ok_parts.append(ok)
    keys = jnp.concatenate(key_parts, axis=1)
    t1 = jnp.concatenate(t_parts, axis=1)
    skey, st = jax.lax.sort((keys, t1), dimension=-1, num_keys=2)
    in_range = skey < (1 << 30)
    prev_k = jnp.concatenate([jnp.full((B, 1), -1, skey.dtype), skey[:, :-1]], 1)
    prev_t = jnp.concatenate([jnp.full((B, 1), -1, st.dtype), st[:, :-1]], 1)
    dup = (skey == prev_k) & (st == prev_t)
    valid = in_range & ~dup
    key_first = valid & (skey != prev_k)
    n_distinct = jnp.sum(valid, axis=-1).astype(jnp.int32)
    return skey, st, valid, key_first, n_distinct, n_peak_overflow


def fingerprint(
    channel_samples,
    Fs: float = 8000,
    wsize: int = 512,
    n_hop: int = 256,
    fan_value: int = 3,
    amp_min: float = 50,
    denoising: bool = False,
    denoising_model: str = "unet",
    denoiser: Optional[Callable] = None,
    get_masks: bool = False,
):
    """Single-channel API parity with ref: fingerprint.py:34-91."""
    if denoising:
        assert denoising_model in ["unet", "demucs"]
    x = jnp.asarray(np.asarray(channel_samples, np.float32))[None, :]
    hook = denoiser if (denoising and denoising_model == "unet") else None
    _, mask, specgram = fingerprint_spectrogram_batch(
        x, Fs, wsize, n_hop, amp_min, denoiser=hook
    )
    mask_np = np.asarray(mask[0])
    peaks = peaks_from_mask(mask_np)
    if get_masks is True:
        return (
            generate_hashes(peaks, fan_value=fan_value),
            mask_np.astype(np.float64),
            np.asarray(specgram[0]),
        )
    return generate_hashes(peaks, fan_value=fan_value)
