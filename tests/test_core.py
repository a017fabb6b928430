"""Unit tests for musicfpaugment_tpu.core against numpy/scipy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.signal

from musicfpaugment_tpu import core


# ---------------------------------------------------------------- utils

def test_calculate_rms(rng):
    x = rng.standard_normal((4, 1, 1000)).astype(np.float32)
    got = np.asarray(core.calculate_rms(jnp.asarray(x)))
    want = np.sqrt(np.mean(x**2, axis=-1))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_rms_normalize(rng):
    x = rng.standard_normal((3, 500)).astype(np.float32) * 7.5
    y = np.asarray(core.rms_normalize(jnp.asarray(x)))
    np.testing.assert_allclose(np.sqrt(np.mean(y**2, axis=-1)), 1.0, atol=1e-4)


def test_peak_normalize_skips_zero(rng):
    x = rng.standard_normal((2, 1, 100)).astype(np.float32)
    x[1] = 0.0
    y = np.asarray(core.peak_normalize(jnp.asarray(x)))
    assert np.isclose(np.abs(y[0]).max(), 1.0, atol=1e-6)
    assert np.all(y[1] == 0.0)
    assert np.all(np.isfinite(y))


def test_mel_roundtrip():
    f = jnp.asarray([0.0, 150.0, 1000.0, 3999.0])
    back = core.convert_mels_to_frequencies(core.convert_frequencies_to_mels(f))
    np.testing.assert_allclose(np.asarray(back), np.asarray(f), rtol=1e-3, atol=1e-3)


def test_mel_matches_reference_formula():
    # ref: augmentation/utils.py:36-51 (2595 * log10(1 + f/700))
    np.testing.assert_allclose(
        float(core.convert_frequencies_to_mels(jnp.float32(1000.0))),
        2595.0 * np.log10(1 + 1000.0 / 700.0),
        rtol=1e-6,
    )


def test_next_fast_len():
    assert core.next_fast_len(1) == 1
    assert core.next_fast_len(7) == 8
    assert core.next_fast_len(13) == 15
    assert core.next_fast_len(1025) == 1080
    # 5-smooth check
    for n in [17, 97, 30011]:
        v = core.next_fast_len(n)
        r = v
        for p in (2, 3, 5):
            while r % p == 0:
                r //= p
        assert r == 1 and v >= n


# ---------------------------------------------------------------- stft

def test_stft_matches_numpy_oracle(rng):
    """Oracle re-derives the audfprint STFT contract (reflect pad n_fft/2,
    periodic Hann, rfft, (freq, time)) directly with numpy."""
    n_fft, hop = 512, 256
    x = rng.standard_normal(8000).astype(np.float32)

    # independent numpy oracle
    win = np.hanning(n_fft + 2)[1:-1]
    xp = np.pad(x, n_fft // 2, mode="reflect")
    nf = 1 + (len(xp) - n_fft) // hop
    frames = np.stack([xp[i * hop : i * hop + n_fft] for i in range(nf)])
    want = np.fft.rfft(frames * win, n_fft).T

    got = np.asarray(core.stft(jnp.asarray(x), n_fft=n_fft, hop_length=hop))
    assert got.shape == want.shape == (n_fft // 2 + 1, nf)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_stft_batched_equals_loop(rng):
    x = rng.standard_normal((3, 4000)).astype(np.float32)
    batched = np.asarray(core.stft(jnp.asarray(x)))
    for i in range(3):
        single = np.asarray(core.stft(jnp.asarray(x[i])))
        np.testing.assert_allclose(batched[i], single, rtol=1e-5, atol=1e-5)


def test_magnitude_spectrogram_normalized(rng):
    x = rng.standard_normal((2, 8000)).astype(np.float32)
    s = np.asarray(core.magnitude_spectrogram(jnp.asarray(x)))
    assert np.isclose(s.max(), 1.0, atol=1e-6)
    assert s.min() >= 0.0


# ---------------------------------------------------------------- convolve

@pytest.mark.parametrize("mode", ["full", "same", "valid"])
def test_fft_convolve_matches_scipy(rng, mode):
    sig = rng.standard_normal(777).astype(np.float32)
    ker = rng.standard_normal(128).astype(np.float32)
    got = np.asarray(core.fft_convolve(jnp.asarray(sig), jnp.asarray(ker), mode=mode))
    if mode == "full":
        want = scipy.signal.fftconvolve(sig, ker, mode="full")
    else:
        # reference truncates centered; scipy 'same' keeps len(sig) which for
        # len(sig)>len(ker) coincides with centered max(m,n)
        want = scipy.signal.fftconvolve(sig, ker, mode=mode)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_fft_convolve_batched(rng):
    sig = rng.standard_normal((4, 2, 300)).astype(np.float32)
    ker = rng.standard_normal((4, 1, 64)).astype(np.float32)
    got = np.asarray(core.fft_convolve(jnp.asarray(sig), jnp.asarray(ker), mode="full"))
    assert got.shape == (4, 2, 300 + 64 - 1)
    for b in range(4):
        for c in range(2):
            want = np.convolve(sig[b, c], ker[b, 0])
            np.testing.assert_allclose(got[b, c], want, rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------- filters

def _julius_lowpass_oracle(x: np.ndarray, cutoff: float, zeros: float = 8.0):
    """Independent numpy oracle for julius.lowpass_filter semantics."""
    half = int(zeros / cutoff / 2)
    win = np.hanning(2 * half + 1)  # symmetric (periodic=False)
    t = np.arange(-half, half + 1)
    arg = 2 * cutoff * t * np.pi
    filt = 2 * cutoff * win * np.where(t == 0, 1.0, np.sin(arg) / np.where(arg == 0, 1, arg))
    filt /= filt.sum()
    xp = np.pad(x, (half, half), mode="edge")
    return np.convolve(xp, filt, mode="valid")


@pytest.mark.parametrize("cutoff", [0.4, 0.1, 0.02])
def test_lowpass_matches_julius_oracle(rng, cutoff):
    x = rng.standard_normal(2048).astype(np.float32)
    want = _julius_lowpass_oracle(x, cutoff)
    got = np.asarray(
        core.lowpass_filter(
            jnp.asarray(x)[None, None, :], jnp.asarray([cutoff]), half_size_max=512
        )
    )[0, 0]
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_lowpass_attenuation(rng):
    """Pass-band preserved, stop-band killed."""
    sr = 8000
    t = np.arange(sr) / sr
    low_tone = np.sin(2 * np.pi * 200 * t).astype(np.float32)
    high_tone = np.sin(2 * np.pi * 3500 * t).astype(np.float32)
    x = jnp.asarray(np.stack([low_tone, high_tone])[:, None, :])
    y = np.asarray(core.lowpass_filter(x, jnp.asarray([1000 / sr, 1000 / sr])))
    # 200 Hz passes
    assert np.sqrt(np.mean(y[0] ** 2)) > 0.6
    # 3500 Hz blocked
    assert np.sqrt(np.mean(y[1] ** 2)) < 0.01


def test_highpass_is_complement(rng):
    x = rng.standard_normal((2, 1, 1000)).astype(np.float32)
    c = jnp.asarray([0.1, 0.3])
    lp = np.asarray(core.lowpass_filter(jnp.asarray(x), c, half_size_max=256))
    hp = np.asarray(core.highpass_filter(jnp.asarray(x), c, half_size_max=256))
    np.testing.assert_allclose(lp + hp, x, rtol=1e-4, atol=1e-5)


def test_lowpass_zero_cutoff_gives_zero(rng):
    x = rng.standard_normal((1, 1, 256)).astype(np.float32)
    y = np.asarray(core.lowpass_filter(jnp.asarray(x), jnp.asarray([0.0]), half_size_max=128))
    np.testing.assert_allclose(y, 0.0, atol=1e-7)


def test_bandstop_is_complement_of_bandpass(rng):
    x = rng.standard_normal((2, 1, 512)).astype(np.float32)
    lo = jnp.asarray([0.05, 0.1])
    hi = jnp.asarray([0.2, 0.3])
    bp = np.asarray(core.bandpass_filter(jnp.asarray(x), lo, hi, half_size_max=256))
    bs = np.asarray(core.bandstop_filter(jnp.asarray(x), lo, hi, half_size_max=256))
    np.testing.assert_allclose(bp + bs, x, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------- noise

def test_colored_noise_shape_and_rms():
    key = jax.random.PRNGKey(0)
    n = np.asarray(core.gen_colored_noise(key, jnp.float32(1.0), 12000, 8000))
    assert n.shape == (12000,)
    # rms-normalized one-second blocks tiled
    assert 0.5 < np.sqrt(np.mean(n[:8000] ** 2)) < 2.0


def test_colored_noise_spectrum_slope():
    """Pink-ish noise must have more low than high frequency energy."""
    key = jax.random.PRNGKey(1)
    n = np.asarray(core.gen_colored_noise(key, jnp.float32(2.0), 8000, 8000))
    spec = np.abs(np.fft.rfft(n))
    low = np.mean(spec[1:100] ** 2)
    high = np.mean(spec[-100:] ** 2)
    assert low > 10 * high


# ---------------------------------------------------------------- resample

def test_upsample_downsample_roundtrip(rng):
    # roundtrip is near-identity only for content below Nyquist where the
    # windowed-sinc pair is flat — use a band-limited multitone
    t = np.arange(1024) / 1024
    x = sum(
        np.sin(2 * np.pi * f * 1024 * t / 8) for f in [0.3, 1.1, 2.7]
    ).astype(np.float32)[None, None, :]
    up = core.upsample2(jnp.asarray(x))
    assert up.shape == (1, 1, 2048)
    down = np.asarray(core.downsample2(up))
    err = np.abs(down - x)[..., 64:-64]  # ignore edge transients
    assert err.max() < 5e-3


def test_upsample2_preserves_original_samples(rng):
    x = rng.standard_normal((1, 64)).astype(np.float32)
    up = np.asarray(core.upsample2(jnp.asarray(x)))
    np.testing.assert_allclose(up[..., ::2], x, rtol=1e-5, atol=1e-6)


def test_resample_frac_identity(rng):
    x = jnp.asarray(rng.standard_normal((2, 100)).astype(np.float32))
    y = core.resample_frac(x, 8000, 8000)
    assert y is x


def test_resample_frac_tone_frequency(rng):
    """A 440 Hz tone resampled 8k->12k stays a 440 Hz tone."""
    sr_in, sr_out = 8000, 12000
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = np.asarray(core.resample_frac(jnp.asarray(x), sr_in, sr_out))
    assert abs(y.shape[-1] - sr_out) <= 1
    spec = np.abs(np.fft.rfft(y[: sr_out]))
    assert abs(np.argmax(spec) - 440) <= 2
    # amplitude roughly preserved
    assert 0.8 < np.max(np.abs(y[100:-100])) < 1.2


def test_resample_frac_downsample_antialias(rng):
    """Content above the new Nyquist must be removed on downsampling."""
    sr_in, sr_out = 8000, 4000
    t = np.arange(sr_in * 2) / sr_in
    hi = np.sin(2 * np.pi * 3500 * t).astype(np.float32)  # above 2 kHz Nyquist
    y = np.asarray(core.resample_frac(jnp.asarray(hi), sr_in, sr_out))
    assert np.sqrt(np.mean(y**2)) < 0.05


def test_toeplitz_conv1d_matches_fft_convolve(rng):
    """The MXU Toeplitz formulation must reproduce fft_convolve for every
    mode at non-multiple-of-block lengths."""
    from musicfpaugment_tpu.core.convolve import fft_convolve, toeplitz_conv1d

    for m, n, block in [(500, 112, 128), (1024, 7, 512), (65, 65, 32)]:
        x = jnp.asarray(rng.standard_normal((2, 3, m)).astype(np.float32))
        k = rng.standard_normal(n).astype(np.float32)
        for mode in ("full", "valid", "same"):
            want = np.asarray(fft_convolve(x, jnp.asarray(k), mode=mode))
            got = np.asarray(toeplitz_conv1d(x, k, mode=mode, block=block))
            assert got.shape == want.shape
            np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
