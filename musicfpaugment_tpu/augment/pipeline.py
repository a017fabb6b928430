"""AugmentFP — the music-degradation pipeline facade (API parity).

TPU-native rebuild of ref: augmentation/__init__.py:16-101. Same fixed
8-stage chain — HighPass -> ImpulseResponse -> BackgroundNoise -> Gain ->
Clipping -> LowPass -> HighPass -> PeakNormalization(p=1) — with the same
``parameters`` dict keys, but compiled to a single XLA program over a
device-resident noise/IR bank. One call augments a whole batch on-device;
there is no per-call disk I/O and no per-transform python loop.

Randomness: the reference hides RNG state in python/torch globals and
``freeze_parameters(seed)`` reseeds them so repeated calls replay a
deterministic stream (ref: augmentation/transform.py:158-165). Here the state
is an explicit JAX PRNG key advanced per call; ``freeze_parameters(seed)``
resets it to ``PRNGKey(seed)`` giving the same reproducible-stream semantics
(bit-exact parity with torch's sampler is out of scope — statistical parity,
SURVEY.md §7 hard-part 5).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from musicfpaugment_tpu.augment.banks import (
    IRBank,
    NoiseBank,
    build_ir_bank,
    build_noise_bank,
)
from musicfpaugment_tpu.augment.compose import Compose
from musicfpaugment_tpu.augment.constants import (
    DEFAULT_PARAMETERS,
    IMPULSE_RESPONSE_DIR,
)
from musicfpaugment_tpu.augment.transforms import (
    AddBackgroundNoise,
    ApplyImpulseResponse,
    Clipping,
    Gain,
    HighPassFilter,
    Identity,
    LowPassFilter,
    PeakNormalization,
)

Array = jnp.ndarray


class AugmentFP:
    """Music augmentation for audio fingerprinting (ref: __init__.py:16-101).

    Args:
        background_paths: the reference's ``{scene: [wav paths]}`` dict, a
            flat path list, a pre-decoded (N, T) numpy array, or a built
            :class:`NoiseBank`.
        sample_rate: waveform sample rate (8000 in all reference configs).
        parameters: the reference parameter dict (verbatim keys).
        impulse_response_dir: directory of IR wavs, an (N, T) array, or a
            built :class:`IRBank`.
    """

    def __init__(
        self,
        background_paths: Union[Dict[str, List[str]], List[str], np.ndarray, NoiseBank],
        sample_rate: int,
        parameters: Dict[str, float] = DEFAULT_PARAMETERS,
        impulse_response_dir: Union[str, np.ndarray, IRBank] = IMPULSE_RESPONSE_DIR,
        noise_row_length: Optional[int] = None,
        batch_quantile_clipping: bool = False,
        fast_chain: bool = True,
        fuse_lti: bool = True,
    ) -> None:
        if isinstance(background_paths, NoiseBank):
            self.noise_bank = background_paths
        else:
            self.noise_bank = build_noise_bank(
                background_paths,
                sample_rate,
                row_length=noise_row_length or 8 * sample_rate,
            )
        if isinstance(impulse_response_dir, IRBank):
            self.ir_bank = impulse_response_dir
        else:
            self.ir_bank = build_ir_bank(impulse_response_dir, sample_rate)

        self.sample_rate = sample_rate
        self.parameters = dict(parameters)

        # Fixed 8-stage chain, ref: augmentation/__init__.py:46-93.
        self.augmentation_pipeline = Compose(
            transforms=[
                HighPassFilter(
                    p=parameters["proba_cutoff_freq1"],
                    min_cutoff_freq=parameters["min_cutoff_freq1"],
                    max_cutoff_freq=parameters["max_cutoff_freq1"],
                    sample_rate=sample_rate,
                ),
                ApplyImpulseResponse(
                    sample_rate=sample_rate,
                    p=parameters["proba_ir_response"],
                ),
                AddBackgroundNoise(
                    p=parameters["proba_snr_in_db"],
                    min_snr_in_db=parameters["min_snr_in_db"],
                    max_snr_in_db=parameters["max_snr_in_db"],
                    sample_rate=sample_rate,
                ),
                Gain(
                    p=parameters["proba_gain_in_db"],
                    min_gain_in_db=parameters["min_gain_in_db"],
                    max_gain_in_db=parameters["max_gain_in_db"],
                ),
                Clipping(
                    p=parameters["proba_percentile_threshold"],
                    min_percentile_threshold=0,
                    max_percentile_threshold=parameters["max_percentile_threshold"],
                    batch_quantile=batch_quantile_clipping,
                ),
                LowPassFilter(
                    p=parameters["proba_cutoff_freq2"],
                    min_cutoff_freq=parameters["min_cutoff_freq2"],
                    max_cutoff_freq=parameters["max_cutoff_freq2"],
                    sample_rate=sample_rate,
                ),
                HighPassFilter(
                    p=parameters["proba_cutoff_freq3"],
                    min_cutoff_freq=parameters["min_cutoff_freq3"],
                    max_cutoff_freq=parameters["max_cutoff_freq3"],
                    sample_rate=sample_rate,
                ),
                PeakNormalization(p=1),
            ]
        )

        # Fast chain: the final PeakNormalization(p=1) makes the whole chain
        # invariant to any positive per-example rescaling of intermediates —
        # every stage after HPF1 is positively homogeneous of degree 1 in its
        # input (convolutions and filters are linear; the noise mix scales its
        # noise by rms(signal); per-example clipping thresholds are quantiles
        # *of the data*, hence scale-equivariant). So the IR and noise stages'
        # peak normalizations and the entire Gain stage (a positive scalar
        # multiply) drop out of the final result exactly, up to float
        # rounding — three full-size HBM passes saved per batch. Gain's key
        # slot is kept by an Identity placeholder so the frozen-seed stream
        # matches the exact chain stage-for-stage. Disabled automatically for
        # batch-quantile clipping (thresholds couple examples across
        # different scales there).
        self.fast_chain = fast_chain and not batch_quantile_clipping
        if self.fast_chain:
            tfms = list(self.augmentation_pipeline.transforms)
            tfms[1] = ApplyImpulseResponse(
                sample_rate=sample_rate,
                p=parameters["proba_ir_response"],
                normalize=False,
            )
            tfms[2] = AddBackgroundNoise(
                p=parameters["proba_snr_in_db"],
                min_snr_in_db=parameters["min_snr_in_db"],
                max_snr_in_db=parameters["max_snr_in_db"],
                sample_rate=sample_rate,
                normalize=False,
            )
            tfms[3] = Identity()
            self._fast_pipeline = Compose(transforms=tfms)

        # LTI fusion: HPF1 and the IR reverb are adjacent per-example LTI
        # stages — under the fast chain their cascade runs as ONE
        # overlap-save convolution with the combined kernel (~25% fewer FFT
        # points; see transforms.fused_highpass_ir). Key slots and draws are
        # identical to the stage-by-stage chain; outputs differ only by
        # float rounding (same divergence class as the fast chain itself).
        self.fuse_lti = fuse_lti and self.fast_chain

        self.are_parameters_frozen = False
        self._key = jax.random.PRNGKey(np.random.SeedSequence().entropy % (2**63))
        self._jitted = jax.jit(self._chain)
        self._jitted_indexed = jax.jit(self._chain_indexed)

    # ------------------------------------------------------------ chain

    def _chain(
        self, key: jax.Array, samples: Array, noise_bank: NoiseBank, ir_bank: IRBank
    ) -> Array:
        # Mono fast path: a size-1 channel axis pads 8x in TPU (8, 128)
        # tiles — strip it for the whole chain and restore at the boundary.
        mono = samples.ndim == 3 and samples.shape[1] == 1
        if mono:
            samples = samples[:, 0, :]
        pipeline = (
            self._fast_pipeline if self.fast_chain else self.augmentation_pipeline
        )
        if self.fuse_lti and samples.ndim == 2:
            from musicfpaugment_tpu.augment.transforms import (
                HighPassFilter,
                LowPassFilter,
                fused_highpass_ir,
                fused_lowpass_highpass,
            )

            tfms = pipeline.transforms
            keys = jax.random.split(key, len(tfms))
            out = fused_highpass_ir(
                keys[0], keys[1], samples, self.sample_rate,
                tfms[0], tfms[1], ir_bank,
            )
            i = 2
            while i < len(tfms):
                # trailing LPF2 -> HPF3 pair: one fused conv pass (HPF is a
                # LowPassFilter subclass, so order the checks)
                if (
                    i + 1 < len(tfms)
                    and isinstance(tfms[i], LowPassFilter)
                    and not isinstance(tfms[i], HighPassFilter)
                    and isinstance(tfms[i + 1], HighPassFilter)
                ):
                    out = fused_lowpass_highpass(
                        keys[i], keys[i + 1], out, self.sample_rate,
                        tfms[i], tfms[i + 1],
                    )
                    i += 2
                    continue
                out = tfms[i](
                    keys[i], out, self.sample_rate,
                    noise_bank=noise_bank, ir_bank=ir_bank,
                )
                i += 1
        else:
            out = pipeline.apply(
                key, samples, self.sample_rate,
                noise_bank=noise_bank, ir_bank=ir_bank,
            )
        return out[:, None, :] if mono else out

    def _chain_indexed(
        self,
        base_key: jax.Array,
        indices: Array,
        samples: Array,
        noise_bank: NoiseBank,
        ir_bank: IRBank,
    ) -> Array:
        """Per-example-key chain: example i is augmented under
        ``fold_in(base_key, indices[i])`` — every randomness draw depends only
        on the example's *global* index, so results are invariant to how the
        corpus is split into batches (the reference gets this per-file via
        batch-size-1 processing, ref: generate_queries.py:74; the round-1
        batched path advanced one key per batch, making the frozen-seed query
        set batch-size-dependent)."""

        def one(i, w):
            return self._chain(
                jax.random.fold_in(base_key, i), w[None], noise_bank, ir_bank
            )[0]

        return jax.vmap(one)(indices, samples)

    def _next_key(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    # ------------------------------------------------------------ API

    def __call__(self, waveform: Union[Array, np.ndarray], key=None) -> Array:
        """Augment one waveform of shape (channels, time) or (time,)
        (ref: __init__.py:95-97)."""
        waveform = jnp.asarray(waveform, jnp.float32)
        squeeze_channel = False
        if waveform.ndim == 1:
            waveform = waveform[None, :]
            squeeze_channel = True
        out = self.batch_augment(waveform[None], key=key)[0]
        return out[0] if squeeze_channel else out

    def batch_augment(self, waveforms: Union[Array, np.ndarray], key=None) -> Array:
        """Augment a batch (batch, channels, time) on-device
        (ref: __init__.py:99-101)."""
        waveforms = jnp.asarray(waveforms, jnp.float32)
        if key is None:
            key = self._next_key()
        return self._jitted(key, waveforms, self.noise_bank, self.ir_bank)

    def batch_augment_indexed(
        self,
        waveforms: Union[Array, np.ndarray],
        indices: Union[Array, np.ndarray, Sequence[int]],
        base_key=None,
    ) -> Array:
        """Batch-size-invariant augmentation: example ``i``'s randomness is a
        pure function of ``indices[i]`` and the frozen base key, so a corpus
        processed in batches of 8 or 64 yields bit-identical outputs. Used by
        frozen-seed query generation (testing/generate_queries.py)."""
        waveforms = jnp.asarray(waveforms, jnp.float32)
        indices = jnp.asarray(indices, jnp.int32)
        if base_key is None:
            # frozen: the base key is the frozen seed itself (not advanced),
            # keeping the full query set a function of (seed, index) only
            base_key = self._key if self.are_parameters_frozen else self._next_key()
        return self._jitted_indexed(
            base_key, indices, waveforms, self.noise_bank, self.ir_bank
        )

    # ------------------------------------------------------------ freezing

    def freeze_parameters(self, seed: int = 0) -> None:
        """Reset the PRNG stream for reproducible query generation
        (ref: composition.py:37-45, transform.py:158-165)."""
        self.are_parameters_frozen = True
        self._key = jax.random.PRNGKey(seed)

    def unfreeze_parameters(self) -> None:
        self.are_parameters_frozen = False
        self._key = jax.random.PRNGKey(np.random.SeedSequence().entropy % (2**63))


def synthetic_banks(
    sample_rate: int = 8000,
    num_noise: int = 16,
    num_irs: int = 8,
    noise_row_length: Optional[int] = None,
    seed: int = 0,
):
    """Small synthetic noise/IR banks for tests, demos, and benchmarks.

    Noise rows are shaped noise bursts; IRs are exponentially-decaying sparse
    reflections — structurally similar to MIT-survey room responses.
    """
    rng = np.random.default_rng(seed)
    L = noise_row_length or 8 * sample_rate
    noise = rng.standard_normal((num_noise, L)).astype(np.float32)
    # color the noise a bit so scenes differ
    for i in range(num_noise):
        kernel = rng.standard_normal(8) / 8
        noise[i] = np.convolve(noise[i], kernel, mode="same")
    ir_len = sample_rate // 2
    t = np.arange(ir_len) / sample_rate
    irs = np.zeros((num_irs, ir_len), np.float32)
    for i in range(num_irs):
        decay = rng.uniform(2.0, 12.0)
        sparse = (rng.random(ir_len) < 0.02) * rng.standard_normal(ir_len)
        irs[i] = (sparse + 0.2 * rng.standard_normal(ir_len)) * np.exp(-decay * t)
        irs[i, 0] = 1.0
    noise_bank = build_noise_bank(noise, sample_rate, row_length=L, seed=seed)
    ir_bank = build_ir_bank(irs, sample_rate)
    return noise_bank, ir_bank


def dcase_shaped_banks(
    sample_rate: int = 8000,
    noise_row_length: Optional[int] = None,
    hours: float = 3.0,
    num_scenes: int = 15,
    num_irs: int = 271,
    seed: int = 0,
):
    """Reference-corpus-SHAPED synthetic banks (VERDICT r3 #6).

    The reference's background-noise pool is the union of six DCASE
    acoustic-scene datasets grouped into ~15 scene labels — hours of audio
    per split (training/background_noise.py:51-108) — and its reverb pool is
    the 271-IR MIT acoustical-reflectance survey
    (augmentation/constants.py:23-25). The toy ``synthetic_banks`` (32 noise
    rows / 16 IRs) make each evaluation "condition" draw from a tiny
    degradation pool, so accuracy-vs-condition numbers at scale are only
    loosely comparable to the reference's. These banks match the reference
    corpus *shape* without shipping DCASE/MIT audio:

    - noise: ``hours`` of audio as row_length rows split across
      ``num_scenes`` synthetic scene timbres, each scene with a distinct FIR
      color, spectral tilt (leaky integrator), amplitude-modulation rhythm,
      optional mains-hum harmonics, and transient (click) density — the
      statistical knobs that distinguish DCASE scene classes;
    - IRs: ``num_irs`` room responses, T60 log-uniform in 0.1–1.2 s, sparse
      signed early reflections inside 50 ms, Gaussian late tail, unit direct
      path — the MIT survey's structure (direct + early + diffuse decay).
    """
    import scipy.signal as sps

    rng = np.random.default_rng(seed)
    L = noise_row_length or 8 * sample_rate
    rows_total = max(num_scenes, int(hours * 3600 * sample_rate / L))
    base, extra = divmod(rows_total, num_scenes)
    t = np.arange(L, dtype=np.float32) / sample_rate
    scenes = {}
    for s in range(num_scenes):
        n_rows = base + (1 if s < extra else 0)
        kernel = (rng.standard_normal(33) * np.hanning(33)).astype(np.float32)
        tilt = rng.uniform(0.0, 0.95)  # leaky-integrator pole: white->brown
        am_rate = rng.uniform(0.1, 4.0)
        am_depth = rng.uniform(0.0, 0.8)
        hum_amp = rng.uniform(0.5, 2.0) if rng.random() < 0.4 else 0.0
        hum_f = float(rng.choice([50.0, 60.0, 100.0]))
        click_rate = rng.uniform(0.5, 3.0) if rng.random() < 0.5 else 0.0
        x = rng.standard_normal((n_rows, L)).astype(np.float32)
        x = sps.fftconvolve(x, kernel[None, :], mode="same", axes=-1)
        if tilt > 0:
            x = sps.lfilter([1.0], [1.0, -tilt], x, axis=-1).astype(np.float32)
        if am_depth > 0:
            phase = rng.uniform(0, 2 * np.pi, (n_rows, 1)).astype(np.float32)
            x *= 1.0 - am_depth / 2 + (am_depth / 2) * np.sin(
                2 * np.pi * am_rate * t[None, :] + phase
            )
        if hum_amp > 0:
            phase = rng.uniform(0, 2 * np.pi, (n_rows, 1)).astype(np.float32)
            rms = np.sqrt(np.mean(x**2, axis=-1, keepdims=True))
            for harm, amp in ((1, 1.0), (2, 0.4)):
                x += (hum_amp * amp * rms) * np.sin(
                    2 * np.pi * hum_f * harm * t[None, :] + phase * harm
                )
        if click_rate > 0:
            rms = np.sqrt(np.mean(x**2, axis=-1, keepdims=True))
            clicks = (
                rng.random((n_rows, L)) < click_rate / sample_rate
            ) * rng.standard_normal((n_rows, L))
            burst = np.exp(-np.arange(32, dtype=np.float32) * 0.2)
            x += 6.0 * rms * sps.fftconvolve(
                clicks, burst[None, :], mode="same", axes=-1
            )
        scenes[f"scene{s:02d}"] = [x[i].astype(np.float32) for i in range(n_rows)]

    ir_len_max = int(1.5 * sample_rate)
    irs = np.zeros((num_irs, ir_len_max), np.float32)
    for i in range(num_irs):
        t60 = float(np.exp(rng.uniform(np.log(0.1), np.log(1.2))))
        n_i = min(int(1.2 * t60 * sample_rate), ir_len_max)
        tt = np.arange(n_i, dtype=np.float32) / sample_rate
        late = rng.standard_normal(n_i).astype(np.float32) * np.exp(
            -(np.log(1000.0) / t60) * tt
        )
        early = np.zeros(n_i, np.float32)
        n_refl = int(rng.integers(3, 12))
        pos = rng.integers(1, max(2, int(0.05 * sample_rate)), n_refl)
        early[pos] = rng.uniform(0.2, 0.9, n_refl) * rng.choice(
            [-1.0, 1.0], n_refl
        )
        ir = 0.25 * late + early
        ir[0] = 1.0
        irs[i, :n_i] = ir
    noise_bank = build_noise_bank(scenes, sample_rate, row_length=L, seed=seed)
    ir_bank = build_ir_bank(irs, sample_rate)
    return noise_bank, ir_bank
