"""Waveform transforms as pure, batched, jit-safe functions.

Redesign of the reference's ``BaseWaveformTransform`` template
(ref: augmentation/transform.py:24-171). There, each transform samples a
per-example Bernoulli ``should_apply`` mask, clones the batch, gathers the
selected subset, randomizes parameters (often with disk I/O), transforms, and
scatters back — shapes are data-dependent and nothing can jit.

Here every transform computes its candidate output for the *whole* batch and
lane-selects with ``jnp.where(mask, transformed, samples)`` — identical math
(unselected lanes keep their input bit-for-bit), static shapes, one fused XLA
program. Hidden torch/python RNG state becomes explicit PRNG keys, which also
removes the reference's thread-unsafety of shared ``transform_parameters``
dicts (SURVEY.md §5 race note).

All transforms take/return ``samples`` of shape (batch, channels, time),
float32.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from musicfpaugment_tpu.augment.banks import IRBank, NoiseBank
from musicfpaugment_tpu.core.convolve import fft_convolve
from musicfpaugment_tpu.core.filters import (
    DEFAULT_HALF_SIZE_MAX,
    DEFAULT_ZEROS,
    highpass_filter,
    lowpass_filter,
    lowpass_kernels,
    bandpass_filter,
    bandstop_filter,
)
from musicfpaugment_tpu.core.noise import batch_colored_noise
from musicfpaugment_tpu.core.utils import (
    calculate_rms,
    convert_decibels_to_amplitude_ratio,
    convert_mels_to_frequencies,
)

Array = jnp.ndarray


def _hz_to_mel(f: float) -> float:
    """Static (trace-free) mel conversion for config-time bounds."""
    return 2595.0 * math.log10(1.0 + f / 700.0)


def _per_example(v: Array, like: Array) -> Array:
    """Reshape a (batch,) vector to broadcast over ``like``'s trailing axes."""
    return v.reshape(v.shape[0], *([1] * (like.ndim - 1)))


def _apply_mask(mask: Array, transformed: Array, samples: Array) -> Array:
    """Per-example lane select (replaces clone/gather/scatter at
    transform.py:101-123)."""
    return jnp.where(_per_example(mask, samples), transformed, samples)


def _uniform(key: jax.Array, batch: int, lo: float, hi: float) -> Array:
    if hi <= lo:
        return jnp.full((batch,), lo, jnp.float32)
    return jax.random.uniform(key, (batch,), jnp.float32, lo, hi)


class BaseWaveformTransform:
    """Static config holder; ``__call__(key, samples, ...)`` is pure/traceable."""

    supports_multichannel = True
    requires_sample_rate = True

    def __init__(self, p: float = 0.5, sample_rate: Optional[int] = None):
        assert 0.0 <= p <= 1.0
        self.p = p
        self.sample_rate = sample_rate

    def __call__(
        self,
        key: jax.Array,
        samples: Array,
        sample_rate: Optional[int] = None,
        noise_bank: Optional[NoiseBank] = None,
        ir_bank: Optional[IRBank] = None,
    ) -> Array:
        if samples.ndim not in (2, 3):
            raise RuntimeError(
                "expects [batch, channels, time] or the mono fast path "
                "[batch, time] (a size-1 channel axis wastes 8x in TPU tile "
                "padding — the pipeline strips it)"
            )
        sr = sample_rate or self.sample_rate
        k_mask, k_tfm = jax.random.split(key)
        batch = samples.shape[0]
        if self.p >= 1.0:
            mask = jnp.ones((batch,), bool)
        elif self.p <= 0.0:
            return samples
        else:
            mask = jax.random.bernoulli(k_mask, self.p, (batch,))
        return self.transform_gated(
            k_tfm, samples, sr, mask, noise_bank=noise_bank, ir_bank=ir_bank
        )

    def transform_gated(
        self, key, samples, sample_rate, mask, *, noise_bank=None, ir_bank=None
    ):
        """Apply with per-example gating. Default: compute the candidate for
        the whole batch and lane-select. Transforms whose identity can be
        expressed through their *parameters* (gain -> 1, cutoff -> 0,
        thresholds -> +-inf) override this to avoid the full-size selects —
        bit-identical results, fewer memory passes."""
        transformed = self.transform(
            key, samples, sample_rate, noise_bank=noise_bank, ir_bank=ir_bank
        )
        return _apply_mask(mask, transformed, samples)

    def transform(self, key, samples, sample_rate, *, noise_bank=None, ir_bank=None):
        raise NotImplementedError


# ----------------------------------------------------------------- filters


class LowPassFilter(BaseWaveformTransform):
    """Low-pass with cutoff sampled uniformly in mel space
    (ref: augmentation/transformations/pass_filters.py:17-115)."""

    _mode = "low"

    def __init__(
        self,
        min_cutoff_freq: float = 150.0,
        max_cutoff_freq: float = 7500.0,
        p: float = 0.5,
        sample_rate: Optional[int] = None,
        half_size_max: Optional[int] = None,
    ):
        super().__init__(p=p, sample_rate=sample_rate)
        if min_cutoff_freq > max_cutoff_freq:
            raise ValueError("min_cutoff_freq must not be greater than max_cutoff_freq")
        self.min_cutoff_freq = float(min_cutoff_freq)
        self.max_cutoff_freq = float(max_cutoff_freq)
        if half_size_max is None:
            # The widest kernel in range is at the smallest cutoff: julius
            # half_size = int(zeros / (f/sr) / 2). Cap at the global max and
            # round up for layout friendliness. A zero lower bound (HPF1's
            # mel-uniform range starts at 0 Hz) is capped at 2048 taps: only
            # the ~7% of draws below zeros*sr/(2*2048) (~7.8 Hz at 8 kHz) get
            # a truncated kernel, and at those cutoffs the high-pass is
            # near-identity (documented divergence; pass half_size_max
            # explicitly for the full-width kernel).
            sr = sample_rate or 8000
            if self.min_cutoff_freq > 0:
                # round up to a multiple of 16 taps for layout friendliness
                # only — the mask makes extra taps exact zeros, but every tap
                # is paid for in the conv (the default LPF band needs just
                # half_size 11; a 64-tap floor tripled its cost)
                h = int(DEFAULT_ZEROS * sr / self.min_cutoff_freq / 2)
                half_size_max = min(DEFAULT_HALF_SIZE_MAX, max(16, -(-h // 16) * 16))
            else:
                half_size_max = min(DEFAULT_HALF_SIZE_MAX, 2048)
        self.half_size_max = half_size_max

    def _sample_cutoffs(self, key, batch, sample_rate) -> Array:
        # ref: pass_filters.py:58-82 — U(ceil(mel(min)), floor(mel(max)));
        # bounds are static python floats, computed outside the trace
        lo = math.ceil(_hz_to_mel(self.min_cutoff_freq))
        hi = math.floor(_hz_to_mel(self.max_cutoff_freq))
        mels = _uniform(key, batch, float(lo), float(hi))
        return convert_mels_to_frequencies(mels) / sample_rate

    def transform(self, key, samples, sample_rate, *, noise_bank=None, ir_bank=None):
        cutoffs = self._sample_cutoffs(key, samples.shape[0], sample_rate)
        fn = lowpass_filter if self._mode == "low" else highpass_filter
        return fn(samples, cutoffs, half_size_max=self.half_size_max)


class HighPassFilter(LowPassFilter):
    """High-pass = identity - low-pass (ref: pass_filters.py:118-155)."""

    _mode = "high"

    def transform_gated(
        self, key, samples, sample_rate, mask, *, noise_bank=None, ir_bank=None
    ):
        # cutoff 0 yields the all-zero julius kernel, so hpf = x - 0 = x:
        # gating through the cutoff is exact and skips the full-size select
        cutoffs = self._sample_cutoffs(key, samples.shape[0], sample_rate)
        cutoffs = jnp.where(mask, cutoffs, 0.0)
        return highpass_filter(samples, cutoffs, half_size_max=self.half_size_max)

    def __init__(
        self,
        min_cutoff_freq: float = 20.0,
        max_cutoff_freq: float = 2400.0,
        p: float = 0.5,
        sample_rate: Optional[int] = None,
        half_size_max: Optional[int] = None,
    ):
        super().__init__(
            min_cutoff_freq, max_cutoff_freq, p=p, sample_rate=sample_rate,
            half_size_max=half_size_max,
        )


class BandPassFilter(BaseWaveformTransform):
    """Band-pass with mel-uniform center + uniform bandwidth fraction
    (ref: augmentation/transformations/band_filters.py:15-155). Defined but
    not in the default AugmentFP chain, mirroring the reference."""

    _complement = False

    def __init__(
        self,
        min_center_frequency: float = 200.0,
        max_center_frequency: float = 4000.0,
        min_bandwidth_fraction: float = 0.5,
        max_bandwidth_fraction: float = 1.99,
        p: float = 0.5,
        sample_rate: Optional[int] = None,
        half_size_max: int = DEFAULT_HALF_SIZE_MAX,
    ):
        super().__init__(p=p, sample_rate=sample_rate)
        if max_center_frequency < min_center_frequency:
            raise ValueError(
                f"max_center_frequency ({max_center_frequency}) should be larger than "
                f"min_center_frequency ({min_center_frequency})."
            )
        if min_bandwidth_fraction <= 0.0:
            raise ValueError("min_bandwidth_fraction must be a positive number")
        if max_bandwidth_fraction < min_bandwidth_fraction:
            raise ValueError(
                f"max_bandwidth_fraction ({max_bandwidth_fraction}) should be larger "
                f"than min_bandwidth_fraction ({min_bandwidth_fraction})."
            )
        if max_bandwidth_fraction >= 2.0:
            raise ValueError(
                f"max_bandwidth_fraction ({max_bandwidth_fraction}) should be smaller "
                f"than 2.0, since otherwise low_cut_frequency of the band can be "
                f"smaller than 0 Hz."
            )
        self.min_center_frequency = min_center_frequency
        self.max_center_frequency = max_center_frequency
        self.min_bandwidth_fraction = min_bandwidth_fraction
        self.max_bandwidth_fraction = max_bandwidth_fraction
        self.half_size_max = half_size_max

    def transform(self, key, samples, sample_rate, *, noise_bank=None, ir_bank=None):
        batch = samples.shape[0]
        k_center, k_bw = jax.random.split(key)
        lo_mel = _hz_to_mel(self.min_center_frequency)
        hi_mel = _hz_to_mel(self.max_center_frequency)
        center = convert_mels_to_frequencies(_uniform(k_center, batch, lo_mel, hi_mel))
        bw = _uniform(k_bw, batch, self.min_bandwidth_fraction, self.max_bandwidth_fraction)
        low = center * (1.0 - 0.5 * bw) / sample_rate
        high = center * (1.0 + 0.5 * bw) / sample_rate
        fn = bandstop_filter if self._complement else bandpass_filter
        return fn(samples, low, high, half_size_max=self.half_size_max)


class BandStopFilter(BandPassFilter):
    """Band-stop = identity - band-pass (ref: band_filters.py:158-207)."""

    _complement = True


# ----------------------------------------------------------------- reverb


class ApplyImpulseResponse(BaseWaveformTransform):
    """Room reverb: random bank IR, FFT convolution, peak normalization
    (ref: augmentation/transformations/impulse_response.py:13-116).

    The IR comes from a device-resident :class:`IRBank` instead of per-call
    disk reads; the zero-padded tail of shorter IRs contributes nothing to the
    linear convolution, so results match the reference's ragged pad_sequence
    batching exactly.
    """

    def __init__(
        self,
        ir_bank: Optional[IRBank] = None,
        sample_rate: Optional[int] = None,
        convolve_mode: str = "full",
        compensate_for_propagation_delay: bool = False,
        p: float = 0.5,
        normalize: bool = True,
    ):
        super().__init__(p=p, sample_rate=sample_rate)
        self.ir_bank = ir_bank
        self.convolve_mode = convolve_mode
        self.compensate_for_propagation_delay = compensate_for_propagation_delay
        # ``normalize=False`` skips the post-convolution peak normalization —
        # used by AugmentFP's fast chain, where the final PeakNormalization
        # makes every intermediate positive rescale a no-op (the whole chain
        # is positively homogeneous of degree 1; see pipeline.py).
        self.normalize = normalize

    def transform(self, key, samples, sample_rate, *, noise_bank=None, ir_bank=None):
        bank = ir_bank if ir_bank is not None else self.ir_bank
        if bank is None:
            raise ValueError("ApplyImpulseResponse requires an IRBank")
        num_samples = samples.shape[-1]
        ir = bank.sample(key, samples.shape[0])  # (B, L)
        ir_b = ir.reshape(ir.shape[0], *([1] * (samples.ndim - 2)), ir.shape[-1])
        convolved = fft_convolve(samples, ir_b, mode=self.convolve_mode)
        if self.normalize:
            # Peak-normalize over the *full* convolution tail, as the
            # reference does before truncation (impulse_response.py:86-91).
            peak = jnp.max(jnp.abs(convolved), axis=-1, keepdims=True)
            convolved = convolved / jnp.where(peak > 0, peak, 1.0)
        if self.compensate_for_propagation_delay:
            delays = jnp.argmax(jnp.abs(ir), axis=-1)

            def shift(sig, d):
                start = (0,) * (sig.ndim - 1) + (d,)
                return jax.lax.dynamic_slice(
                    sig, start, sig.shape[:-1] + (num_samples,)
                )

            return jax.vmap(shift)(convolved, delays)
        return convolved[..., :num_samples]


# ----------------------------------------------------------------- noise


class AddBackgroundNoise(BaseWaveformTransform):
    """SNR-controlled scene-noise mixing
    (ref: augmentation/transformations/background_noise.py:15-213).

    Noise crops come from a device-resident :class:`NoiseBank`; the
    SNR -> amplitude math and final peak normalization match the reference.
    """

    def __init__(
        self,
        noise_bank: Optional[NoiseBank] = None,
        min_snr_in_db: float = 3.0,
        max_snr_in_db: float = 30.0,
        p: float = 0.5,
        sample_rate: Optional[int] = None,
        mixup: bool = False,
        normalize: bool = True,
    ):
        super().__init__(p=p, sample_rate=sample_rate)
        if min_snr_in_db > max_snr_in_db:
            raise ValueError("min_snr_in_db must not be greater than max_snr_in_db")
        self.noise_bank = noise_bank
        self.min_snr_in_db = float(min_snr_in_db)
        self.max_snr_in_db = float(max_snr_in_db)
        self.mixup = mixup
        # see ApplyImpulseResponse.normalize — fast-chain scale elision
        self.normalize = normalize

    def transform(self, key, samples, sample_rate, *, noise_bank=None, ir_bank=None):
        bank = noise_bank if noise_bank is not None else self.noise_bank
        if bank is None:
            raise ValueError("AddBackgroundNoise requires a NoiseBank")
        batch, num_samples = samples.shape[0], samples.shape[-1]
        k_noise, k_snr = jax.random.split(key)
        if self.mixup:
            background = bank.sample_pair(k_noise, batch, num_samples)
        else:
            background = bank.sample(k_noise, batch, num_samples)
        snr = _uniform(k_snr, batch, self.min_snr_in_db, self.max_snr_in_db)
        # background_noise.py:195-201
        snr_b = snr.reshape(batch, *([1] * (samples.ndim - 2)))
        background_rms = calculate_rms(samples) / (10 ** (snr_b / 20.0))
        bg = background.reshape(batch, *([1] * (samples.ndim - 2)), num_samples)
        mixed = samples + background_rms[..., None] * bg
        if not self.normalize:
            return mixed
        peak = jnp.max(jnp.abs(mixed), axis=-1, keepdims=True)
        return mixed / jnp.where(peak > 0, peak, 1.0)


class AddColoredNoise(BaseWaveformTransform):
    """1/f^decay noise at random SNR (ref:
    augmentation/transformations/colored_noise.py:41-146). Not in the default
    chain, mirroring the reference."""

    def __init__(
        self,
        min_snr_in_db: float = 3.0,
        max_snr_in_db: float = 30.0,
        min_f_decay: float = -2.0,
        max_f_decay: float = 2.0,
        p: float = 0.5,
        sample_rate: Optional[int] = None,
    ):
        super().__init__(p=p, sample_rate=sample_rate)
        if min_snr_in_db > max_snr_in_db:
            raise ValueError("min_snr_in_db must not be greater than max_snr_in_db")
        if min_f_decay > max_f_decay:
            raise ValueError("min_f_decay must not be greater than max_f_decay")
        self.min_snr_in_db = float(min_snr_in_db)
        self.max_snr_in_db = float(max_snr_in_db)
        self.min_f_decay = float(min_f_decay)
        self.max_f_decay = float(max_f_decay)

    def transform(self, key, samples, sample_rate, *, noise_bank=None, ir_bank=None):
        batch, num_samples = samples.shape[0], samples.shape[-1]
        k_noise, k_snr, k_decay = jax.random.split(key, 3)
        snr = _uniform(k_snr, batch, self.min_snr_in_db, self.max_snr_in_db)
        f_decay = _uniform(k_decay, batch, self.min_f_decay, self.max_f_decay)
        noise = batch_colored_noise(
            k_noise, f_decay, num_samples, self.sample_rate or sample_rate or 44100
        )
        snr_b = snr.reshape(batch, *([1] * (samples.ndim - 2)))
        noise_rms = calculate_rms(samples) / (10 ** (snr_b / 20.0))
        nz = noise.reshape(batch, *([1] * (samples.ndim - 2)), num_samples)
        mixed = samples + noise_rms[..., None] * nz
        peak = jnp.max(jnp.abs(mixed), axis=-1, keepdims=True)
        return mixed / jnp.where(peak > 0, peak, 1.0)


# ----------------------------------------------------------------- amplitude


class Gain(BaseWaveformTransform):
    """Random uniform dB gain (ref: augmentation/transformations/gain.py:10-70)."""

    requires_sample_rate = False

    def __init__(
        self,
        min_gain_in_db: float = -18.0,
        max_gain_in_db: float = 6.0,
        p: float = 0.5,
        sample_rate: Optional[int] = None,
    ):
        super().__init__(p=p, sample_rate=sample_rate)
        if min_gain_in_db >= max_gain_in_db:
            raise ValueError("max_gain_in_db must be higher than min_gain_in_db")
        self.min_gain_in_db = float(min_gain_in_db)
        self.max_gain_in_db = float(max_gain_in_db)

    def transform(self, key, samples, sample_rate, *, noise_bank=None, ir_bank=None):
        gains_db = _uniform(key, samples.shape[0], self.min_gain_in_db, self.max_gain_in_db)
        return samples * _per_example(
            convert_decibels_to_amplitude_ratio(gains_db), samples
        )

    def transform_gated(
        self, key, samples, sample_rate, mask, *, noise_bank=None, ir_bank=None
    ):
        gains_db = _uniform(key, samples.shape[0], self.min_gain_in_db, self.max_gain_in_db)
        ratio = jnp.where(mask, convert_decibels_to_amplitude_ratio(gains_db), 1.0)
        return samples * _per_example(ratio, samples)


class Clipping(BaseWaveformTransform):
    """Percentile clipping (ref: augmentation/transformations/clipping.py:10-101).

    A percentile threshold q is drawn per example; samples below the (q/2)-th
    or above the (1-q/2)-th percentile are clipped.

    Divergence (documented, SURVEY.md §7 hard-part 6): the reference computes
    the percentiles over the *whole selected sub-batch* flattened
    (``torch.quantile(samples[:, 0, :], thresholds)`` at clipping.py:76-90),
    coupling examples. Default here is per-example percentiles — identical for
    the batch-size-1 query-generation path — with ``batch_quantile=True`` for
    bug-for-bug parity.
    """

    requires_sample_rate = False

    def __init__(
        self,
        min_percentile_threshold: float = 0.0,
        max_percentile_threshold: float = 1.0,
        p: float = 0.5,
        sample_rate: Optional[int] = None,
        batch_quantile: bool = False,
    ):
        super().__init__(p=p, sample_rate=sample_rate)
        assert 0 <= min_percentile_threshold
        assert 1 >= max_percentile_threshold
        assert min_percentile_threshold <= max_percentile_threshold
        if min_percentile_threshold >= max_percentile_threshold:
            raise ValueError(
                "max_percentile_threshold must be higher than min_percentile_threshold"
            )
        self.min_percentile_threshold = float(min_percentile_threshold)
        self.max_percentile_threshold = float(max_percentile_threshold)
        self.batch_quantile = batch_quantile

    @staticmethod
    def _interp_quantile(sorted_vals: Array, q: Array) -> Array:
        """torch.quantile linear interpolation on pre-sorted trailing axis."""
        n = sorted_vals.shape[-1]
        pos = q * (n - 1)
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n - 2)
        frac = pos - lo.astype(pos.dtype)
        v_lo = jnp.take_along_axis(sorted_vals, lo[..., None], axis=-1)[..., 0]
        v_hi = jnp.take_along_axis(sorted_vals, (lo + 1)[..., None], axis=-1)[..., 0]
        return v_lo * (1.0 - frac) + v_hi * frac

    @staticmethod
    def _order_statistics(x: Array, ranks: Array) -> Array:
        """Exact per-row k-th order statistics without sorting.

        Uses the radix-sortable uint32 view of float32 (monotone bijection)
        and a 32-step vectorized binary search on the key space: each step is
        one counting pass over (B, T) — far cheaper than a 64k-element TPU
        sort when only a handful of ranks are needed.

        x: (B, T) float32; ranks: (B, R) int32 (0-based). Returns (B, R).
        """
        u = jax.lax.bitcast_convert_type(x, jnp.uint32)
        # monotone key: negatives -> ~u (descending halves flipped),
        # positives -> u | 0x8000_0000
        neg = (u >> jnp.uint32(31)) == jnp.uint32(1)
        keys = jnp.where(neg, ~u, u | jnp.uint32(0x80000000))  # (B, T)

        B, R = ranks.shape
        lo = jnp.zeros((B, R), jnp.uint32)
        hi = jnp.full((B, R), jnp.uint32(0xFFFFFFFF))

        def step(_, state):
            lo, hi = state
            mid = lo + (hi - lo) // jnp.uint32(2)
            # count(keys <= mid) per (row, rank): (B, T, 1) vs (B, 1, R)
            cnt = jnp.sum(
                (keys[:, :, None] <= mid[:, None, :]).astype(jnp.int32), axis=1
            )
            ge = cnt >= ranks + 1  # mid is >= the rank-th order statistic
            hi = jnp.where(ge, mid, hi)
            lo = jnp.where(ge, lo, mid + jnp.uint32(1))
            return lo, hi

        lo, hi = jax.lax.fori_loop(0, 32, step, (lo, hi))
        key = lo
        back = jnp.where(
            key & jnp.uint32(0x80000000), key ^ jnp.uint32(0x80000000), ~key
        )
        return jax.lax.bitcast_convert_type(back, jnp.float32)

    def _thresholds(self, key, samples):
        batch = samples.shape[0]
        q = _uniform(key, batch, self.min_percentile_threshold, self.max_percentile_threshold)
        lower_q = q / 2.0
        ch0 = samples[:, 0, :] if samples.ndim == 3 else samples
        if self.batch_quantile:
            flat = jnp.sort(ch0.reshape(-1))
            flat_b = jnp.broadcast_to(flat, (batch, flat.shape[0]))
            lower = self._interp_quantile(flat_b, lower_q)
            upper = self._interp_quantile(flat_b, 1.0 - lower_q)
        else:
            # exact per-row quantiles via binary-search selection (no sort):
            # both tails' bracketing order statistics in one search
            n = ch0.shape[-1]
            pos_lo = lower_q * (n - 1)
            pos_hi = (1.0 - lower_q) * (n - 1)
            k_lo = jnp.clip(jnp.floor(pos_lo).astype(jnp.int32), 0, n - 2)
            k_hi = jnp.clip(jnp.floor(pos_hi).astype(jnp.int32), 0, n - 2)
            ranks = jnp.stack([k_lo, k_lo + 1, k_hi, k_hi + 1], axis=1)
            vals = self._order_statistics(ch0, ranks)  # (B, 4)
            frac_lo = pos_lo - k_lo.astype(pos_lo.dtype)
            frac_hi = pos_hi - k_hi.astype(pos_hi.dtype)
            lower = vals[:, 0] * (1.0 - frac_lo) + vals[:, 1] * frac_lo
            upper = vals[:, 2] * (1.0 - frac_hi) + vals[:, 3] * frac_hi
        return lower, upper

    def transform(self, key, samples, sample_rate, *, noise_bank=None, ir_bank=None):
        lower, upper = self._thresholds(key, samples)
        return jnp.clip(
            samples, _per_example(lower, samples), _per_example(upper, samples)
        )

    def transform_gated(
        self, key, samples, sample_rate, mask, *, noise_bank=None, ir_bank=None
    ):
        # gate through the thresholds: clip(x, -inf, +inf) == x exactly
        lower, upper = self._thresholds(key, samples)
        lower = jnp.where(mask, lower, -jnp.inf)
        upper = jnp.where(mask, upper, jnp.inf)
        return jnp.clip(
            samples, _per_example(lower, samples), _per_example(upper, samples)
        )


class Identity(BaseWaveformTransform):
    """No-op placeholder that keeps a chain's per-stage key layout intact.

    AugmentFP's fast chain replaces Gain with this: a per-example scalar
    multiply is erased by the final PeakNormalization (chain homogeneity, see
    pipeline.py), but the stage must still occupy its key slot so the frozen-
    seed random stream matches the exact chain stage-for-stage.
    """

    requires_sample_rate = False

    def __call__(self, key, samples, sample_rate=None, noise_bank=None, ir_bank=None):
        return samples


class PeakNormalization(BaseWaveformTransform):
    """Scale so the per-example peak hits 0 dBFS; all-zero snippets untouched
    (ref: augmentation/transformations/peak_normalization.py:10-67)."""

    requires_sample_rate = False

    def transform(self, key, samples, sample_rate, *, noise_bank=None, ir_bank=None):
        # per-example extreme over channels *and* time (peak_normalization.py:42-45)
        axes = tuple(range(1, samples.ndim))
        peak = jnp.max(jnp.abs(samples), axis=axes, keepdims=True)
        return jnp.where(peak > 0, samples / jnp.where(peak > 0, peak, 1.0), samples)


# ----------------------------------------------------------------- LTI fusion


def _gate_mask(key: jax.Array, p: float, batch: int) -> Array:
    """The Bernoulli gate of ``BaseWaveformTransform.__call__`` as a value
    (identical draws from the same key)."""
    if p >= 1.0:
        return jnp.ones((batch,), bool)
    if p <= 0.0:
        return jnp.zeros((batch,), bool)
    return jax.random.bernoulli(key, p, (batch,))


def fused_highpass_ir(
    key_hpf: jax.Array,
    key_ir: jax.Array,
    samples: Array,
    sample_rate: int,
    hpf: "HighPassFilter",
    ir_tf: "ApplyImpulseResponse",
    ir_bank: IRBank,
) -> Array:
    """HPF1 and the IR reverb as ONE overlap-save convolution (fast chain).

    Both stages are LTI per example, so their cascade is a single
    convolution by the combined kernel ``(δ − k_lp) ⊛ ir`` — one pass over
    the signal instead of two, ~25% fewer FFT points by the overlap-save
    cost model (the kernel-kernel convolution is over ~8k taps, amortized
    against two full 64k-signal passes). Randomness consumes the two
    stages' key slots exactly as the unfused chain does (same splits, same
    Bernoulli gates, same cutoff/IR draws), so frozen-seed streams are
    unchanged; outputs differ from the unfused cascade only by float
    rounding (convolution associativity), the fast chain's documented
    divergence class. Examples with both gates off return bit-exact
    passthrough, as unfused. Mono (B, T) only — the multichannel path keeps
    the stage-by-stage chain.

    ``normalize`` semantics: valid under the fast chain only, where the IR
    stage's peak normalization is elided (pipeline.py scale-invariance
    proof).
    """
    B, T = samples.shape
    H1 = hpf.half_size_max
    # --- HPF1 draws (key usage identical to BaseWaveformTransform.__call__)
    k_mask, k_tfm = jax.random.split(key_hpf)
    mask_h = _gate_mask(k_mask, hpf.p, B)
    cutoffs = hpf._sample_cutoffs(k_tfm, B, sample_rate)
    cutoffs = jnp.where(mask_h, cutoffs, 0.0)
    # --- IR draws
    k_mask1, k_tfm1 = jax.random.split(key_ir)
    mask_ir = _gate_mask(k_mask1, ir_tf.p, B)
    ir = ir_bank.sample(k_tfm1, B)  # (B, L)
    L = ir.shape[-1]
    delta_ir = jnp.zeros((L,), samples.dtype).at[0].set(1.0)
    ir_eff = jnp.where(mask_ir[:, None], ir, delta_ir[None, :])
    # --- combined kernel: highpass (δ at center − k_lp) convolved with ir
    k_lp = lowpass_kernels(cutoffs, H1)  # (B, 2*H1+1); cutoff<=0 -> zeros
    k_hp = (-k_lp).at[:, H1].add(1.0)
    k_comb = fft_convolve(k_hp, ir_eff, mode="full")  # (B, 2*H1+L)
    # --- one overlap-save pass. Replicate padding by H1 reproduces the HPF
    # edge behavior; slicing [2*H1 : 2*H1+T] composes the HPF 'valid' slice
    # with the IR stage's causal [:T] truncation exactly.
    pad_cfg = [(0, 0)] * (samples.ndim - 1) + [(H1, H1)]
    pad_x = jnp.pad(samples, pad_cfg, mode="edge")
    y = fft_convolve(pad_x, k_comb, mode="full")[..., 2 * H1 : 2 * H1 + T]
    # --- left-edge correction. The unfused chain truncates the HPF output
    # to [0, T) BEFORE the IR conv, so the IR sees zeros there; the fused
    # pass instead convolves the HPF's (pad-region) tail at negative times
    # into the first L-1 outputs. Subtract that contamination: it is the
    # convolution of the HPF full-result over [-(L-1), 0) with the IR —
    # two kernel-length convolutions, negligible next to the main pass.
    if L > 1:
        lead = L - 1
        seg = pad_x[..., : 2 * H1]  # covers every sample the tail needs
        full_s = fft_convolve(seg, k_hp, mode="full")
        # hpf at t in [-(L-1), 0); tail positions before -(2*H1) are exact
        # zeros in both formulations (outside the full conv's support), so
        # an IR longer than the HPF pad window left-fills with zeros — a
        # negative slice start would silently wrap instead
        take = min(lead, 2 * H1)
        w = full_s[..., 2 * H1 - take : 2 * H1]
        if take < lead:
            w = jnp.pad(w, [(0, 0)] * (w.ndim - 1) + [(lead - take, 0)])
        corr = fft_convolve(w, ir_eff, mode="full")[..., lead : 2 * lead]
        y = y.at[..., :lead].add(-corr)
    # bit-exact passthrough where both gates are off (matches the unfused
    # chain, whose gated-off lanes never touch an FFT)
    off = (cutoffs <= 0.0) & ~mask_ir
    return jnp.where(off[:, None], samples, y)


def _conv_edge_valid(x: Array, kernels: Array, pad: int) -> Array:
    """Replicate-pad by ``pad`` then 'valid' per-example convolution, with
    the same direct/FFT dispatch as :func:`core.filters.lowpass_filter`
    (kernels: (B, 2*pad+1))."""
    from musicfpaugment_tpu.core.filters import (
        DIRECT_CONV_MAX_TAPS,
        _direct_conv_valid,
        _edge_pad,
    )

    padded = _edge_pad(x, pad)
    if kernels.shape[-1] <= DIRECT_CONV_MAX_TAPS:
        return _direct_conv_valid(padded, kernels)
    return fft_convolve(padded, kernels, mode="valid")


def fused_lowpass_highpass(
    key_lpf: jax.Array,
    key_hpf: jax.Array,
    samples: Array,
    sample_rate: int,
    lpf: "LowPassFilter",
    hpf: "HighPassFilter",
) -> Array:
    """LPF2 and HPF3 (the chain's trailing filter pair) as ONE conv pass.

    Both are per-example LTI stages, so the cascade is one convolution by
    the combined kernel ``e_l ⊛ (δ − k_h)`` where ``e_l`` is the low-pass
    kernel (or δ for gated-off lanes — the unfused stage lane-selects) and
    ``k_h`` the high-pass's low-pass part (cutoff 0 for gated-off lanes,
    exactly as ``HighPassFilter.transform_gated``). Saves the low-pass's
    full-signal memory pass.

    Unlike the HPF1⊛IR fusion, BOTH stages replicate-pad their own input,
    and stage 2 pads the *stage-1 output* — a plain fused conv gets every
    sample within ``E = H_l + H_h`` of either edge wrong (round-3 measured
    the uncorrected boundary error at ~1k samples). The exact fix: the
    interior comes from the fused kernel (identical by LTI composition, up
    to float associativity), and the two ``E``-sample edge regions are
    recomputed stage-by-stage on short slices (length ``2E``), which is
    exact because a valid conv only reads ``H`` neighbours: the slice
    values feeding the kept outputs are never contaminated by the slice's
    own replicate padding. Key usage matches the unfused stages
    (same splits, same Bernoulli gates, same cutoff draws), so frozen-seed
    streams are unchanged. Mono (B, T) only.
    """
    B, T = samples.shape
    Hl, Hh = lpf.half_size_max, hpf.half_size_max
    E = Hl + Hh
    # --- draws (identical key usage to BaseWaveformTransform.__call__)
    k_mask_l, k_tfm_l = jax.random.split(key_lpf)
    mask_l = _gate_mask(k_mask_l, lpf.p, B)
    c_l = lpf._sample_cutoffs(k_tfm_l, B, sample_rate)
    k_mask_h, k_tfm_h = jax.random.split(key_hpf)
    mask_h = _gate_mask(k_mask_h, hpf.p, B)
    c_h = hpf._sample_cutoffs(k_tfm_h, B, sample_rate)
    c_h = jnp.where(mask_h, c_h, 0.0)
    # --- effective kernels
    k_l = lowpass_kernels(c_l, Hl)  # (B, 2*Hl+1)
    delta_l = jnp.zeros((2 * Hl + 1,), samples.dtype).at[Hl].set(1.0)
    e_l = jnp.where(mask_l[:, None], k_l, delta_l[None, :])
    k_h = lowpass_kernels(c_h, Hh)  # rows are exact zeros when cutoff <= 0
    d_h = (-k_h).at[:, Hh].add(1.0)  # δ − k_h

    if T <= 2 * E:
        # too short to stitch — run the stages (still fewer passes than the
        # generic chain: gating rides the kernels)
        y = _conv_edge_valid(samples, e_l, Hl)
        z = y - _conv_edge_valid(y, k_h, Hh)
    else:
        k_c = fft_convolve(e_l, d_h, mode="full")  # (B, 2E+1)
        z = _conv_edge_valid(samples, k_c, E)
        # exact staged edges on 2E-sample slices. Left: y values feeding
        # kept outputs are y[0 : E+Hh), whose windows end at x[E+Hh+Hl-1]
        # = x[2E-1] — inside the slice; the HPF's left replicate pad sees
        # the true y[0]. Right: mirrored.
        xl = samples[:, : 2 * E]
        yl = _conv_edge_valid(xl, e_l, Hl)[:, : E + Hh]
        zl = yl - _conv_edge_valid(yl, k_h, Hh)
        xr = samples[:, T - 2 * E :]
        yr = _conv_edge_valid(xr, e_l, Hl)
        zr = yr - _conv_edge_valid(yr, k_h, Hh)
        z = z.at[:, :E].set(zl[:, :E])
        z = z.at[:, T - E :].set(zr[:, -E:])
    # bit-exact passthrough where both gates are off, as unfused
    off = ~mask_l & (c_h <= 0.0)
    return jnp.where(off[:, None], samples, z)


__all__ = [
    "BaseWaveformTransform",
    "LowPassFilter",
    "HighPassFilter",
    "BandPassFilter",
    "BandStopFilter",
    "ApplyImpulseResponse",
    "AddBackgroundNoise",
    "AddColoredNoise",
    "Gain",
    "Clipping",
    "Identity",
    "PeakNormalization",
    "fused_highpass_ir",
    "fused_lowpass_highpass",
]
