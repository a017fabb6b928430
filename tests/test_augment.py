"""Statistical/property tests for the AugmentFP engine.

The reference has no unit tests; these verify each transform's defining
property (achieved SNR, cutoff response, clip fraction, normalization) plus
determinism and jit-ability of the whole chain (SURVEY.md §4 strategy).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from musicfpaugment_tpu import augment
from musicfpaugment_tpu.augment import transforms as T

SR = 8000


@pytest.fixture(scope="module")
def banks():
    return augment.synthetic_banks(sample_rate=SR, noise_row_length=4 * SR, seed=1)


def _music(batch=4, seconds=2, seed=3):
    """Deterministic band-limited multitone 'music'."""
    rng = np.random.default_rng(seed)
    t = np.arange(seconds * SR) / SR
    out = np.zeros((batch, 1, seconds * SR), np.float32)
    for b in range(batch):
        for f in rng.uniform(100, 3000, size=5):
            out[b, 0] += np.sin(2 * np.pi * f * t + rng.uniform(0, 6)).astype(np.float32)
    return 0.15 * out


# ------------------------------------------------------------ gating

def test_bernoulli_gating_passthrough():
    x = jnp.asarray(_music())
    tfm = T.Gain(min_gain_in_db=-5, max_gain_in_db=5, p=0.0)
    y = tfm(jax.random.PRNGKey(0), x, SR)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_bernoulli_gating_partial():
    x = jnp.asarray(_music(batch=256, seconds=1))
    tfm = T.Gain(min_gain_in_db=4.9, max_gain_in_db=5.0, p=0.5)
    y = np.asarray(tfm(jax.random.PRNGKey(1), x, SR))
    changed = np.any(y != np.asarray(x), axis=(1, 2))
    # ~half of the 256 examples transformed
    assert 80 < changed.sum() < 176
    # untouched lanes are bit-identical
    np.testing.assert_array_equal(y[~changed], np.asarray(x)[~changed])


# ------------------------------------------------------------ gain

def test_gain_range():
    x = jnp.asarray(_music(batch=64))
    tfm = T.Gain(min_gain_in_db=-5, max_gain_in_db=5, p=1.0)
    y = np.asarray(tfm(jax.random.PRNGKey(2), x, SR))
    ratio = np.max(np.abs(y), axis=-1) / np.max(np.abs(np.asarray(x)), axis=-1)
    db = 20 * np.log10(ratio)
    assert db.min() >= -5.01 and db.max() <= 5.01
    assert db.std() > 1.0  # actually random


# ------------------------------------------------------------ filters

def _band_energy(sig, lo, hi):
    spec = np.abs(np.fft.rfft(sig))**2
    freqs = np.fft.rfftfreq(sig.shape[-1], 1 / SR)
    return spec[(freqs >= lo) & (freqs < hi)].sum()


def test_lowpass_transform_kills_highs():
    t = np.arange(SR) / SR
    x = (np.sin(2 * np.pi * 500 * t) + np.sin(2 * np.pi * 3800 * t)).astype(np.float32)
    x = jnp.asarray(x[None, None, :])
    tfm = T.LowPassFilter(min_cutoff_freq=3000, max_cutoff_freq=3001, p=1.0, sample_rate=SR)
    y = np.asarray(tfm(jax.random.PRNGKey(3), x, SR))[0, 0]
    assert _band_energy(y, 3600, 3999) < 0.01 * _band_energy(y, 400, 600)


def test_highpass_transform_kills_lows():
    t = np.arange(SR) / SR
    x = (np.sin(2 * np.pi * 50 * t) + np.sin(2 * np.pi * 1000 * t)).astype(np.float32)
    x = jnp.asarray(x[None, None, :])
    tfm = T.HighPassFilter(min_cutoff_freq=149, max_cutoff_freq=150, p=1.0, sample_rate=SR)
    y = np.asarray(tfm(jax.random.PRNGKey(4), x, SR))[0, 0]
    assert _band_energy(y, 0, 80) < 0.05 * _band_energy(y, 900, 1100)


def test_bandstop_notches():
    t = np.arange(SR) / SR
    x = (np.sin(2 * np.pi * 300 * t) + np.sin(2 * np.pi * 1000 * t)
         + np.sin(2 * np.pi * 3000 * t)).astype(np.float32)
    x = jnp.asarray(x[None, None, :])
    tfm = T.BandStopFilter(
        min_center_frequency=1000, max_center_frequency=1001,
        min_bandwidth_fraction=0.5, max_bandwidth_fraction=0.51,
        p=1.0, sample_rate=SR,
    )
    y = np.asarray(tfm(jax.random.PRNGKey(5), x, SR))[0, 0]
    assert _band_energy(y, 950, 1050) < 0.05 * _band_energy(y, 250, 350)


# ------------------------------------------------------------ noise

def test_background_noise_achieved_snr(banks):
    noise_bank, _ = banks
    x = jnp.asarray(_music(batch=16, seconds=2))
    tfm = T.AddBackgroundNoise(min_snr_in_db=0, max_snr_in_db=0, p=1.0, sample_rate=SR)
    y = np.asarray(
        tfm(jax.random.PRNGKey(6), x, SR, noise_bank=noise_bank)
    )
    xn = np.asarray(x)
    # mixed = (x + n)/peak with rms(n) == rms(x) at snr 0; recovered noise
    # energy should be within a couple dB of the signal energy
    for b in range(16):
        scale = np.max(np.abs(xn[b] + (y[b] * 0)))  # placeholder; estimate scale
    # simpler: before peak-norm, snr==0 means rms(noise)=rms(x). After mixing,
    # total power ~ 2x signal power => output/input rms ratio (pre-norm) ~ sqrt(2).
    # Verify statistically: correlation of y with x notably below 1.
    corr = [
        np.corrcoef(y[b, 0], xn[b, 0])[0, 1] for b in range(16)
    ]
    assert 0.4 < np.mean(corr) < 0.95


def test_background_noise_high_snr_is_nearly_clean(banks):
    noise_bank, _ = banks
    x = jnp.asarray(_music(batch=8))
    tfm = T.AddBackgroundNoise(min_snr_in_db=40, max_snr_in_db=40, p=1.0, sample_rate=SR)
    y = np.asarray(tfm(jax.random.PRNGKey(7), x, SR, noise_bank=noise_bank))
    xn = np.asarray(x)
    for b in range(8):
        # up to peak normalization, y ~ x
        scale = np.dot(y[b, 0], xn[b, 0]) / np.dot(xn[b, 0], xn[b, 0])
        resid = y[b, 0] - scale * xn[b, 0]
        snr_db = 10 * np.log10(np.sum((scale * xn[b, 0]) ** 2) / np.sum(resid**2))
        assert snr_db > 30


def test_colored_noise_transform():
    x = jnp.asarray(_music(batch=4))
    tfm = T.AddColoredNoise(min_snr_in_db=5, max_snr_in_db=5, p=1.0, sample_rate=SR)
    y = np.asarray(tfm(jax.random.PRNGKey(8), x, SR))
    assert y.shape == x.shape
    assert not np.allclose(y, np.asarray(x))
    assert np.abs(y).max() <= 1.0 + 1e-5


# ------------------------------------------------------------ reverb

def test_impulse_response_identity_ir():
    """A delta IR must leave the (peak-normalized) signal unchanged."""
    irs = np.zeros((2, 100), np.float32)
    irs[:, 0] = 1.0
    bank = augment.build_ir_bank(irs, SR)
    x = jnp.asarray(_music(batch=3))
    tfm = T.ApplyImpulseResponse(sample_rate=SR, p=1.0)
    y = np.asarray(tfm(jax.random.PRNGKey(9), x, SR, ir_bank=bank))
    xn = np.asarray(x)
    expected = xn / np.max(np.abs(xn), axis=-1, keepdims=True)
    np.testing.assert_allclose(y, expected, rtol=1e-3, atol=1e-4)


def test_impulse_response_smears(banks):
    _, ir_bank = banks
    x = np.zeros((1, 1, SR), np.float32)
    x[0, 0, 100] = 1.0  # click
    tfm = T.ApplyImpulseResponse(sample_rate=SR, p=1.0)
    y = np.asarray(tfm(jax.random.PRNGKey(10), jnp.asarray(x), SR, ir_bank=ir_bank))
    # reverb spreads energy after the click
    assert np.sum(np.abs(y[0, 0, 200:])) > 0.5


# ------------------------------------------------------------ clipping

def test_clipping_fraction():
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((4, 1, 20000)).astype(np.float32))
    tfm = T.Clipping(min_percentile_threshold=0.1, max_percentile_threshold=0.100001, p=1.0)
    y = np.asarray(tfm(jax.random.PRNGKey(12), x, SR))
    xn = np.asarray(x)
    for b in range(4):
        clipped = np.mean(y[b] != xn[b])
        assert 0.07 < clipped < 0.13  # ~10% of points clipped (5% each tail)


def test_clipping_batch_quantile_mode():
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.standard_normal((4, 1, 5000)).astype(np.float32))
    tfm = T.Clipping(
        min_percentile_threshold=0.2, max_percentile_threshold=0.2000001,
        p=1.0, batch_quantile=True,
    )
    y = np.asarray(tfm(jax.random.PRNGKey(14), x, SR))
    # thresholds computed over the whole batch: identical clip levels per row
    ymax = y.max(axis=-1)
    np.testing.assert_allclose(ymax, ymax.mean(), rtol=0.05)


# ------------------------------------------------------------ normalization

def test_peak_normalization():
    x = jnp.asarray(_music(batch=3) * 0.01)
    tfm = T.PeakNormalization(p=1.0)
    y = np.asarray(tfm(jax.random.PRNGKey(15), x, SR))
    np.testing.assert_allclose(np.max(np.abs(y), axis=(1, 2)), 1.0, atol=1e-5)


# ------------------------------------------------------------ pipeline

def test_augmentfp_end_to_end(banks):
    noise_bank, ir_bank = banks
    fp = augment.AugmentFP(noise_bank, SR, impulse_response_dir=ir_bank)
    wav = jnp.asarray(_music(batch=1)[0])  # (1, T)
    out = fp(wav)
    assert out.shape == wav.shape
    out_np = np.asarray(out)
    assert np.isfinite(out_np).all()
    assert np.isclose(np.abs(out_np).max(), 1.0, atol=1e-4)  # final peak-norm


def test_augmentfp_batch(banks):
    noise_bank, ir_bank = banks
    fp = augment.AugmentFP(noise_bank, SR, impulse_response_dir=ir_bank)
    wavs = jnp.asarray(_music(batch=4))
    out = np.asarray(fp.batch_augment(wavs))
    assert out.shape == wavs.shape
    assert np.isfinite(out).all()


def test_augmentfp_freeze_determinism(banks):
    noise_bank, ir_bank = banks
    fp = augment.AugmentFP(noise_bank, SR, impulse_response_dir=ir_bank)
    wav = jnp.asarray(_music(batch=1)[0])

    fp.freeze_parameters(42)
    a1 = np.asarray(fp(wav))
    a2 = np.asarray(fp(wav))  # stream advances: different params
    fp.freeze_parameters(42)
    b1 = np.asarray(fp(wav))
    b2 = np.asarray(fp(wav))
    np.testing.assert_array_equal(a1, b1)
    np.testing.assert_array_equal(a2, b2)
    assert not np.array_equal(a1, a2)


def test_augmentfp_condition_dicts(banks):
    """All 10 reference eval-condition parameter dicts must run."""
    from musicfpaugment_tpu.testing.parameters import test_pipelines_parameters

    noise_bank, ir_bank = banks
    wav = jnp.asarray(_music(batch=1, seconds=1)[0])
    for name, params in test_pipelines_parameters.items():
        fp = augment.AugmentFP(
            noise_bank, SR, parameters=params, impulse_response_dir=ir_bank
        )
        out = np.asarray(fp(wav))
        assert np.isfinite(out).all(), name


def test_compose_someof_oneof(banks):
    _, ir_bank = banks
    x = jnp.asarray(_music(batch=2, seconds=1))
    tfms = [
        T.Gain(min_gain_in_db=-1, max_gain_in_db=1, p=1.0),
        T.PeakNormalization(p=1.0),
    ]
    one = augment.OneOf(tfms)
    y = one(jax.random.PRNGKey(16), x, SR)
    assert y.shape == x.shape
    some = augment.SomeOf((1, 2), tfms)
    y = some(jax.random.PRNGKey(17), x, SR)
    assert y.shape == x.shape


def test_sharded_augmenter_matches_single_device(banks):
    """8-device mesh output must equal the single-device chain bit-for-bit
    (same key, same program — only the layout differs)."""
    import jax
    from musicfpaugment_tpu.parallel.augment_sharded import ShardedAugmenter
    from musicfpaugment_tpu.parallel import make_mesh

    noise_bank, ir_bank = banks
    fp = augment.AugmentFP(noise_bank, SR, impulse_response_dir=ir_bank)
    wavs = jnp.asarray(_music(batch=8, seconds=1))
    key = jax.random.PRNGKey(21)
    single = np.asarray(fp.batch_augment(wavs, key=key))

    sharded = ShardedAugmenter(fp, mesh=make_mesh(8))
    out = np.asarray(sharded.batch_augment(wavs, key=key))
    np.testing.assert_allclose(out, single, rtol=1e-5, atol=1e-6)

    with pytest.raises(ValueError):
        sharded.batch_augment(wavs[:3], key=key)


def test_batch_augment_indexed_batch_size_invariance(banks):
    """fold_in(base_key, global_index) per example: the frozen-seed output
    for a corpus is identical however it is batched (VERDICT r1 #6; the
    reference achieves this by per-file batch-1 processing,
    ref: generate_queries.py:74)."""
    noise_bank, ir_bank = banks
    fp = augment.AugmentFP(noise_bank, SR, impulse_response_dir=ir_bank)
    wavs = _music(batch=6, seconds=1)  # (B, 1, T)
    fp.freeze_parameters(42)
    full = np.asarray(fp.batch_augment_indexed(wavs, np.arange(6)))
    fp.freeze_parameters(42)
    a = np.asarray(fp.batch_augment_indexed(wavs[:2], [0, 1]))
    b = np.asarray(fp.batch_augment_indexed(wavs[2:], [2, 3, 4, 5]))
    np.testing.assert_array_equal(full, np.concatenate([a, b]))
    # distinct indices produce distinct augmentations
    assert not np.allclose(full[0], full[1])


def test_generate_augmented_queries_batch_size_invariant(tmp_path, banks):
    import os
    import pickle

    from musicfpaugment_tpu.testing.generate_queries import (
        generate_augmented_queries,
    )

    noise_bank, ir_bank = banks
    cleans = tmp_path / "cleans"
    cleans.mkdir()
    wavs = _music(batch=5, seconds=1)
    for i in range(5):
        with open(cleans / f"q{i}.pkl", "wb") as f:
            pickle.dump(wavs[i], f)
    outs = []
    for bs in (2, 5):
        out = tmp_path / f"aug_bs{bs}"
        fp = augment.AugmentFP(noise_bank, SR, impulse_response_dir=ir_bank)
        generate_augmented_queries(
            str(out), {}, save=True, augmenter=fp, cleans_path=str(cleans),
            batch_size=bs,
        )
        outs.append(
            {q: pickle.load(open(out / q, "rb")) for q in os.listdir(out)}
        )
    assert outs[0].keys() == outs[1].keys()
    for q in outs[0]:
        np.testing.assert_array_equal(outs[0][q], outs[1][q])


def test_fast_chain_matches_exact_chain(banks):
    """The fast chain's scale elisions (pipeline.py proof) and the fused
    HPF1+IR LTI pass must reproduce the exact stage-by-stage chain up to
    float rounding — the final PeakNormalization(p=1) pins the scale."""
    noise_bank, ir_bank = banks
    wavs = jnp.asarray(_music(batch=8))
    key = jax.random.PRNGKey(11)
    fast = augment.AugmentFP(noise_bank, SR, impulse_response_dir=ir_bank)
    exact = augment.AugmentFP(
        noise_bank, SR, impulse_response_dir=ir_bank, fast_chain=False
    )
    a = np.asarray(fast.batch_augment(wavs, key=key))
    b = np.asarray(exact.batch_augment(wavs, key=key))
    np.testing.assert_allclose(a, b, rtol=2e-3, atol=5e-5)


@pytest.mark.slow
def test_fused_lti_matches_unfused(banks):
    """fused_highpass_ir (HPF1 ⊛ IR as one overlap-save pass, including the
    left-edge truncation correction) == the stage-by-stage pair, for every
    gate combination the Bernoulli masks produce."""
    noise_bank, ir_bank = banks
    fp = augment.AugmentFP(noise_bank, SR, impulse_response_dir=ir_bank)
    tfms = fp._fast_pipeline.transforms
    x = jnp.asarray(_music(batch=16)[:, 0, :])
    for seed in (0, 3):
        keys = jax.random.split(jax.random.PRNGKey(seed), len(tfms))
        fused = np.asarray(
            T.fused_highpass_ir(
                keys[0], keys[1], x, SR, tfms[0], tfms[1], fp.ir_bank
            )
        )
        h = tfms[0](keys[0], x, SR, noise_bank=fp.noise_bank, ir_bank=fp.ir_bank)
        unf = np.asarray(
            tfms[1](keys[1], h, SR, noise_bank=fp.noise_bank, ir_bank=fp.ir_bank)
        )
        scale = max(np.abs(unf).max(), 1.0)
        np.testing.assert_allclose(fused / scale, unf / scale, atol=3e-6)
    # whole chain: fused on vs off
    wavs = jnp.asarray(_music(batch=8))
    key = jax.random.PRNGKey(7)
    a = np.asarray(fp.batch_augment(wavs, key=key))
    unfused_fp = augment.AugmentFP(
        noise_bank, SR, impulse_response_dir=ir_bank, fuse_lti=False
    )
    b = np.asarray(unfused_fp.batch_augment(wavs, key=key))
    np.testing.assert_allclose(a, b, rtol=2e-3, atol=5e-5)


def test_noise_bank_fullrow_gather_matches_dynamic_slice(banks):
    """When crops span the full row (max_off == 0) the sampler's row-gather
    fast path must equal the dynamic-slice draw bit-for-bit."""
    noise_bank, _ = banks
    key = jax.random.PRNGKey(5)
    L = noise_bank.row_length
    fast = np.asarray(noise_bank.sample(key, 12, L))
    # reference draw: force the slow path by asking for one fewer sample of
    # a zero-offset crop is not equivalent; instead replicate the slow path
    # inline (offset is drawn but max_off == 0 pins it to zero)
    k_scene, k_row, k_off = jax.random.split(key, 3)
    n_scenes = noise_bank.scene_starts.shape[0]
    scene = jax.random.randint(k_scene, (12,), 0, n_scenes)
    row_u = jax.random.uniform(k_row, (12,))
    row = noise_bank.scene_starts[scene] + (
        row_u * noise_bank.scene_counts[scene].astype(jnp.float32)
    ).astype(jnp.int32)

    def crop(r):
        return jax.lax.dynamic_slice(noise_bank.clips[r], (0,), (L,))

    from musicfpaugment_tpu.core.utils import rms_normalize

    slow = np.asarray(rms_normalize(jax.vmap(crop)(row)))
    np.testing.assert_array_equal(fast, slow)


def test_fused_lti_long_ir(banks):
    """IRs longer than the HPF pad window (2*H1+1 taps) exercise the
    zero-fill branch of the fused pass's left-edge correction — a negative
    slice start would silently wrap and corrupt the first L-1 samples."""
    noise_bank, _ = banks
    rng = np.random.default_rng(2)
    L = 2 * 2048 + 2000  # > 2*H1 for the default HPF1 (H1 = 2048)
    irs = (rng.standard_normal((2, L)) * np.exp(
        -6.0 * np.arange(L) / L)).astype(np.float32)
    irs[:, 0] = 1.0
    from musicfpaugment_tpu.augment.banks import build_ir_bank

    ir_bank = build_ir_bank(irs, SR)
    fp = augment.AugmentFP(noise_bank, SR, impulse_response_dir=ir_bank)
    tfms = fp._fast_pipeline.transforms
    x = jnp.asarray(_music(batch=8)[:, 0, :])
    keys = jax.random.split(jax.random.PRNGKey(3), len(tfms))
    fused = np.asarray(
        T.fused_highpass_ir(keys[0], keys[1], x, SR, tfms[0], tfms[1], ir_bank)
    )
    h = tfms[0](keys[0], x, SR, noise_bank=fp.noise_bank, ir_bank=ir_bank)
    unf = np.asarray(
        tfms[1](keys[1], h, SR, noise_bank=fp.noise_bank, ir_bank=ir_bank)
    )
    scale = max(np.abs(unf).max(), 1.0)
    np.testing.assert_allclose(fused / scale, unf / scale, atol=5e-6)


@pytest.mark.slow
def test_dcase_shaped_banks_shapes_and_pipeline():
    """VERDICT r3 #6: reference-corpus-SHAPED banks — scene-structured noise
    rows across 15 scene timbres and a 271-IR reverb pool (the MIT survey
    count, ref augmentation/constants.py:23-25) — build and drive the full
    augmentation pipeline."""
    nb, ib = augment.dcase_shaped_banks(
        sample_rate=SR, noise_row_length=2 * SR, hours=0.05,
        num_scenes=5, num_irs=17, seed=3,
    )
    assert nb.scene_starts.shape[0] == 5
    assert int(nb.scene_counts.sum()) == max(5, int(0.05 * 3600 * SR / (2 * SR)))
    assert ib.irs.shape[0] == 17
    assert np.isfinite(np.asarray(nb.clips)).all()
    assert np.isfinite(np.asarray(ib.irs)).all()
    fp = augment.AugmentFP(nb, SR, impulse_response_dir=ib)
    x = jnp.asarray(_music(batch=4)[:, 0, :])
    y = np.asarray(fp.batch_augment(x, key=jax.random.PRNGKey(0)))
    assert y.shape == x.shape and np.isfinite(y).all()


@pytest.mark.slow
def test_fused_lowpass_highpass_matches_unfused(banks):
    """fused_lowpass_highpass (LPF2 ⊛ HPF3 as one pass, exact staged edge
    stitching) == the stage-by-stage pair across gate combinations,
    including the E = H_l + H_h boundary regions that a naive fused conv
    gets wrong."""
    noise_bank, ir_bank = banks
    fp = augment.AugmentFP(noise_bank, SR, impulse_response_dir=ir_bank)
    tfms = fp._fast_pipeline.transforms
    lpf_i = next(
        i for i, t in enumerate(tfms)
        if isinstance(t, T.LowPassFilter) and not isinstance(t, T.HighPassFilter)
        and i > 1
    )
    lpf, hpf = tfms[lpf_i], tfms[lpf_i + 1]
    assert isinstance(hpf, T.HighPassFilter)
    x = jnp.asarray(_music(batch=16)[:, 0, :])
    for seed in (0, 3, 11):
        kl, kh = jax.random.split(jax.random.PRNGKey(seed))
        fused = np.asarray(
            T.fused_lowpass_highpass(kl, kh, x, SR, lpf, hpf)
        )
        y = lpf(kl, x, SR, noise_bank=fp.noise_bank, ir_bank=fp.ir_bank)
        unf = np.asarray(
            hpf(kh, y, SR, noise_bank=fp.noise_bank, ir_bank=fp.ir_bank)
        )
        scale = max(np.abs(unf).max(), 1.0)
        np.testing.assert_allclose(fused / scale, unf / scale, atol=3e-6)
    # short-input branch (T <= 2E): staged fallback inside the fused path
    xs = x[:, : lpf.half_size_max + hpf.half_size_max]
    kl, kh = jax.random.split(jax.random.PRNGKey(5))
    fused = np.asarray(T.fused_lowpass_highpass(kl, kh, xs, SR, lpf, hpf))
    y = lpf(kl, xs, SR, noise_bank=fp.noise_bank, ir_bank=fp.ir_bank)
    unf = np.asarray(hpf(kh, y, SR, noise_bank=fp.noise_bank, ir_bank=fp.ir_bank))
    scale = max(np.abs(unf).max(), 1.0)
    np.testing.assert_allclose(fused / scale, unf / scale, atol=3e-6)
