"""audfprint landmark peak extraction — batched lax.scan TPU kernel.

The reference's hottest loop (SURVEY.md §3, "hot loops ranked #1") is the
decaying-threshold peak pruner: a Python loop over spectrogram columns with a
mutable 256-bin threshold envelope, run 10k queries x 4 shifts at eval time
(ref: afp/audfprint/peak_extractor.py:173-234).

TPU-native design: one ``lax.scan`` over time columns, vectorized over the
*batch* — the carry is the (batch, freq) threshold envelope, each step does
dense (batch, freq) vector work (local-max detection, top-k, Gaussian
max-merge from a precomputed (freq, freq) bump table). Two key observations
make the forward pass embarrassingly vectorizable within a column:

* candidates are tested against the *column-start* threshold, and all top-k
  survivors are accepted unconditionally (peak_extractor.py:190-203), so the
  per-column threshold update commutes — a single max over k Gaussian rows;
* the backward pass *does* have an intra-column dependency (each accepted
  peak raises the bar for smaller ones, :206-234), but forward pruning caps
  peaks per column at ``maxpksperframe`` (5), so a tiny unrolled loop of 5
  argmax steps suffices.

Whole-batch peak masks for B 8-second queries are produced by a single XLA
program; there is no per-query Python.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from musicfpaugment_tpu.core.convolve import fft_convolve
from musicfpaugment_tpu.core.stft import stft

Array = jnp.ndarray


# ------------------------------------------------------------ frontend


def _col_mask(shape, valid_frames: Array) -> Array:
    """(B, F, C) boolean mask of columns < valid_frames[b]."""
    B, F, C = shape
    return (
        jnp.arange(C)[None, None, :] < valid_frames[:, None, None]
    )


def spectrogram_frontend(
    waveforms: Array,
    n_fft: int = 512,
    n_hop: int = 256,
    denoiser: Optional[Callable[[Array], Array]] = None,
    valid_frames: Optional[Array] = None,
) -> Array:
    """|STFT| / max, with optional spectrogram denoiser hook.

    ref: peak_extractor.py:256-269 — per-example max normalization, then the
    (optional) UNet denoiser on the normalized magnitude.
    Returns (batch, n_fft//2 + 1, frames).

    ``valid_frames`` (B,) marks per-example real frame counts for batches of
    mixed-length waveforms padded to a common length: columns at or past the
    bound are zeroed before normalization (so the per-example max matches the
    unpadded computation exactly) and re-zeroed after the denoiser (whose
    output there is meaningless). A denoiser's receptive field crossing the
    boundary is a documented approximation — its interior columns see zero
    context past ``valid_frames`` just as the unpadded run sees the model's
    own zero padding, but coarse U-Net scales can mix a few boundary frames.
    """
    sgram = jnp.abs(stft(waveforms, n_fft=n_fft, hop_length=n_hop))
    if valid_frames is not None:
        sgram = jnp.where(_col_mask(sgram.shape, valid_frames), sgram, 0.0)
    denom = jnp.max(sgram, axis=(-2, -1), keepdims=True)
    sgram = sgram / jnp.maximum(denom, jnp.finfo(sgram.dtype).tiny)
    if denoiser is not None:
        sgram = denoiser(sgram)
        if valid_frames is not None:
            sgram = jnp.where(_col_mask(sgram.shape, valid_frames), sgram, 0.0)
    return sgram


def log_hpf_frontend(sgram: Array, valid_frames: Optional[Array] = None) -> Array:
    """log + mean-subtract + per-row one-pole HPF, Nyquist row dropped.

    ref: peak_extractor.py:271-290. The IIR ``lfilter([1,-1],[1,-0.98])`` is
    a first-order recurrence; it is evaluated exactly as a convolution of the
    first difference with the 0.98^k exponential kernel (FFT conv — no
    sequential loop).

    With ``valid_frames``, the log-mean is taken over valid columns only
    (matching the unpadded computation); the HPF recurrence is causal, so
    padded columns cannot influence valid outputs.
    """
    sgrammax = jnp.max(sgram, axis=(-2, -1), keepdims=True)
    safe = jnp.maximum(sgram, sgrammax / 1e6)
    logsg = jnp.log(jnp.where(sgrammax > 0, safe, 1.0))
    if valid_frames is None:
        logsg = logsg - jnp.mean(logsg, axis=(-2, -1), keepdims=True)
    else:
        m = _col_mask(logsg.shape, valid_frames)
        F = logsg.shape[-2]
        tot = jnp.sum(jnp.where(m, logsg, 0.0), axis=(-2, -1), keepdims=True)
        cnt = (F * valid_frames).astype(logsg.dtype)[:, None, None]
        logsg = logsg - tot / jnp.maximum(cnt, 1.0)
    # first difference x[n] - x[n-1] with x[-1] = 0
    n_cols = logsg.shape[-1]
    diff = logsg - jnp.pad(logsg, [(0, 0)] * (logsg.ndim - 1) + [(1, 0)])[..., :-1]
    kernel = jnp.asarray(0.98 ** np.arange(n_cols, dtype=np.float64), jnp.float32)
    filtered = fft_convolve(diff, kernel, mode="full")[..., :n_cols]
    return filtered[..., :-1, :]  # drop Nyquist row so bins fit in 8 bits


# ------------------------------------------------------------ peak pruning


@functools.lru_cache(maxsize=None)
def _gauss_table_np(npts: int, width: float) -> np.ndarray:
    """(npts, npts) table G[p, i] = exp(-0.5 ((i - p) / width)^2)
    (the reference's cached __sp_vals, peak_extractor.py:159-171, unrolled
    into a gatherable matrix)."""
    d = np.arange(npts)[None, :] - np.arange(npts)[:, None]
    return np.exp(-0.5 * (d / width) ** 2).astype(np.float32)


def _locmax(v: Array) -> Array:
    """Boolean local-max mask on the trailing axis, end-point semantics of
    the reference's ``locmax`` (peak_extractor.py:61-73): first point is a
    peak if v[0] > v[1] fails to dominate... precisely: nbr[i] = v[i] >=
    v[i-1] (nbr[0]=True, nbr[n]=False), mask = nbr[:-1] & ~nbr[1:]."""
    up = v[..., 1:] >= v[..., :-1]
    shape_one = v.shape[:-1] + (1,)
    nbr_prev = jnp.concatenate([jnp.ones(shape_one, bool), up], axis=-1)
    nbr_next = jnp.concatenate([up, jnp.zeros(shape_one, bool)], axis=-1)
    return nbr_prev & ~nbr_next


def _spread_init(v: Array, gauss: Array) -> Array:
    """Initial threshold envelope: max of Gaussians at the local maxima of v
    over a zero base (ref: spreadpeaksinvector, peak_extractor.py:115-171).
    v: (B, F) -> (B, F)."""
    mask = _locmax(v)
    vals = jnp.where(mask, v, -jnp.inf)  # (B, F)
    bumps = vals[..., None] * gauss[None, :, :]  # (B, F, F); -inf rows vanish
    return jnp.maximum(0.0, jnp.max(bumps, axis=-2))


def forward_prune(sgram: Array, a_dec: float, f_sd: float, maxpks: int) -> Array:
    """Forward decaying-threshold prune (ref: peak_extractor.py:173-204).

    sgram: (batch, freq, cols) log-HPF spectrogram (Nyquist already dropped).
    Returns boolean peak mask (batch, freq, cols).
    """
    B, F, C = sgram.shape
    gauss = jnp.asarray(_gauss_table_np(F, f_sd))
    sthresh0 = _spread_init(jnp.max(sgram[..., : min(10, C)], axis=-1), gauss)

    def step(sthresh, s_col):  # s_col: (B, F)
        cand = _locmax(s_col) & (s_col > sthresh)
        vals = jnp.where(cand, s_col, -jnp.inf)
        top_vals, top_idx = jax.lax.top_k(vals, maxpks)  # (B, k)
        accept = top_vals > -jnp.inf
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (B, maxpks, F), 2)
            == top_idx[..., None]
        )
        peaks_col = jnp.any(onehot & accept[..., None], axis=1)  # (B, F)
        bumps = jnp.where(
            accept[..., None], top_vals[..., None] * gauss[top_idx], -jnp.inf
        )  # (B, k, F)
        sthresh = jnp.maximum(sthresh, jnp.max(bumps, axis=1)) * a_dec
        return sthresh, peaks_col

    _, peaks = jax.lax.scan(step, sthresh0, jnp.moveaxis(sgram, -1, 0))
    return jnp.moveaxis(peaks, 0, -1)  # (B, F, C)


def backward_prune(
    sgram: Array,
    peaks: Array,
    a_dec: float,
    f_sd: float,
    maxpks: int,
    valid_frames: Optional[Array] = None,
) -> Array:
    """Backward prune: remove peaks masked by later-in-time peaks
    (ref: peak_extractor.py:206-234).

    Processes columns in reverse; within a column, peaks are re-tested in
    descending value order against the envelope *updated by the larger peaks
    of the same column* — a 5-step unrolled argmax loop. A kept peak also
    deletes any same-bin peak in the immediately following column (already
    processed, so only the output mask is affected).

    With ``valid_frames`` (mixed-length batches), the initial envelope is the
    spread of each example's *true* last column (gathered per example) and
    the envelope is frozen — no decay, no candidates — while the reverse scan
    crosses that example's padded columns, so the state on entering column
    ``valid_frames[b] - 1`` equals the unpadded run's initial state exactly.
    """
    B, F, C = sgram.shape
    gauss = jnp.asarray(_gauss_table_np(F, f_sd))
    if valid_frames is None:
        sthresh0 = _spread_init(sgram[..., -1], gauss)
    else:
        last = jnp.take_along_axis(
            sgram, (valid_frames - 1)[:, None, None], axis=-1
        )[..., 0]  # (B, F)
        sthresh0 = _spread_init(last, gauss)
    iota_f = jax.lax.broadcasted_iota(jnp.int32, (B, F), 1)

    def step(sthresh, xs):
        s_col, peaks_col, col = xs  # (B, F), (B, F), scalar col index
        if valid_frames is not None:
            active = col < valid_frames  # (B,)
            peaks_col = peaks_col & active[:, None]
        vals = jnp.where(peaks_col, s_col, -jnp.inf)
        kept = jnp.zeros((B, F), bool)

        def inner(_, state):
            vals, sthresh, kept = state
            pos = jnp.argmax(vals, axis=-1)  # (B,)
            val = jnp.take_along_axis(vals, pos[:, None], axis=-1)[:, 0]
            active = val > -jnp.inf
            thr_at = jnp.take_along_axis(sthresh, pos[:, None], axis=-1)[:, 0]
            keep = active & (val >= thr_at)
            onehot = iota_f == pos[:, None]  # (B, F)
            bump = jnp.where(keep[:, None], val[:, None] * gauss[pos], -jnp.inf)
            sthresh = jnp.maximum(sthresh, bump)
            kept = kept | (onehot & keep[:, None])
            vals = jnp.where(onehot, -jnp.inf, vals)
            return vals, sthresh, kept

        vals, new_sthresh, kept = jax.lax.fori_loop(
            0, maxpks, inner, (vals, sthresh, kept)
        )
        new_sthresh = new_sthresh * a_dec
        if valid_frames is not None:
            # frozen across padded columns: the decay only starts once the
            # scan enters the example's real signal
            new_sthresh = jnp.where(active[:, None], new_sthresh, sthresh)
        return new_sthresh, kept

    xs = (
        jnp.moveaxis(sgram, -1, 0)[::-1],
        jnp.moveaxis(peaks, -1, 0)[::-1],
        jnp.arange(C)[::-1],
    )
    _, kept_rev = jax.lax.scan(step, sthresh0, xs)
    kept = jnp.moveaxis(kept_rev[::-1], 0, -1)  # (B, F, C)
    # a kept peak at column c deletes a same-bin peak at column c+1
    kill = jnp.pad(kept, [(0, 0), (0, 0), (1, 0)])[..., :-1]
    return kept & ~kill


def find_peaks_batch(
    waveforms: Array,
    density: float = 20.0,
    n_fft: int = 512,
    n_hop: int = 256,
    f_sd: float = 30.0,
    maxpksperframe: int = 5,
    denoiser: Optional[Callable[[Array], Array]] = None,
    use_pallas: Optional[bool] = None,
    valid_frames: Optional[Array] = None,
) -> Array:
    """Full peak extraction for a batch of waveforms (batch, time).

    Returns boolean peak mask (batch, n_fft//2, frames) — the Nyquist row is
    dropped like the reference (peak_extractor.py:286-290). The decay
    constant matches peak_extractor.py:295.

    ``use_pallas`` switches the pruning passes to the fused Pallas kernels
    (peaks_pallas.py) — VMEM-resident threshold envelope, one-hot-matmul
    Gaussian lookups on the MXU. Default (None) resolves by backend: the
    Pallas path is the production default on TPU (measured 6,624 vs 6,057
    queries/s for the scan path on one chip, BENCH r2; agreement ~2e-5 of
    cells, float associativity only), the scan path on CPU (where Mosaic
    kernels would need interpret mode).

    ``valid_frames`` (B,) int32 enables mixed-length batches: waveforms must
    be padded with 256 reflected samples then zeros (see
    ``analyzer.pad_waveform_batch``), and every column at or past the bound
    produces no peaks while valid columns match the unpadded run (the
    frontends mask normalization/mean, the backward envelope initializes from
    the true last column). Mixed-length batches take the scan kernels — the
    Pallas pruning kernels assume a uniform column count.
    """
    sgram = spectrogram_frontend(waveforms, n_fft, n_hop, denoiser, valid_frames)
    logsg = log_hpf_frontend(sgram, valid_frames)
    a_dec = float(1 - 0.01 * (density * np.sqrt(n_hop / 352.8) / 35))
    if use_pallas is None:
        # Mosaic kernels compile only for TPU targets ("axon" is this image's
        # remote-TPU tunnel platform); GPU/CPU backends take the scan path.
        use_pallas = jax.default_backend() in ("tpu", "axon")
    if valid_frames is not None:
        # padded columns are driven to a large negative constant so the
        # forward pass admits no candidates there (threshold >= 0 always)
        colmask = _col_mask(logsg.shape, valid_frames)
        logsg = jnp.where(colmask, logsg, -1e30)
        peaks = forward_prune(logsg, a_dec, f_sd, maxpksperframe)
        kept = backward_prune(
            logsg, peaks & colmask, a_dec, f_sd, maxpksperframe, valid_frames
        )
        return kept & colmask
    if use_pallas:
        from musicfpaugment_tpu.afp.audfprint.peaks_pallas import (
            backward_prune_pallas,
            forward_prune_pallas,
        )

        peaks = forward_prune_pallas(logsg, a_dec, f_sd, maxpksperframe)
        return backward_prune_pallas(logsg, peaks, a_dec, f_sd, maxpksperframe)
    peaks = forward_prune(logsg, a_dec, f_sd, maxpksperframe)
    return backward_prune(logsg, peaks, a_dec, f_sd, maxpksperframe)


find_peaks_batch_jit = jax.jit(
    find_peaks_batch,
    static_argnames=("density", "n_fft", "n_hop", "f_sd", "maxpksperframe", "denoiser"),
)
