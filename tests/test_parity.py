"""Cross-framework parity tests against torch (CPU) — the reference's
numerical frontends reproduced bit-closely, plus the experimental MXU FFT."""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")


def test_loss_stft_matches_torch(rng):
    """stft_magnitude == torch.stft magnitude at all three loss resolutions
    (ref: training/loss.py:10-41, 128-158)."""
    from musicfpaugment_tpu.train.losses import stft_magnitude

    x = rng.standard_normal((2, 8000)).astype(np.float32)
    for fs, ss, wl in [(1024, 120, 600), (2048, 240, 1200), (512, 50, 240)]:
        st = torch.stft(
            torch.tensor(x), fs, ss, wl, torch.hann_window(wl), return_complex=True
        )
        mag_t = (
            torch.sqrt(torch.clamp(st.real**2 + st.imag**2, min=1e-7))
            .transpose(2, 1)
            .numpy()
        )
        mag_j = np.asarray(stft_magnitude(jnp.asarray(x), fs, ss, wl))
        assert mag_t.shape == mag_j.shape
        np.testing.assert_allclose(mag_j, mag_t, rtol=1e-4, atol=1e-5)


def test_model_spectrogram_matches_torch(rng):
    """spectrogram_batch == the reference's torch.stft frontend
    (ref: training/visualisation.py:13-36: n_fft 512, hop 256,
    np.hanning(514)[1:-1] window, center reflect padding, |.|).

    Normalization divergence (documented in spectrogram_batch): the reference
    divides by the batch-global max; this framework divides per example to
    match AFP inference (peak_extractor.py:265-269). The torch oracle here is
    therefore applied per example.
    """
    from musicfpaugment_tpu.train.trainer import spectrogram_batch

    x = rng.standard_normal((2, 24000)).astype(np.float32)
    window = torch.tensor(np.hanning(512 + 2)[1:-1])
    st = torch.stft(
        torch.tensor(x, dtype=torch.float64),
        n_fft=512,
        hop_length=256,
        window=window,
        return_complex=True,
    )
    mag_t = torch.absolute(st)
    mag_t = (mag_t / mag_t.amax(dim=(1, 2), keepdim=True)).numpy()
    mag_j = np.asarray(spectrogram_batch(jnp.asarray(x)))
    assert mag_j.shape == mag_t.shape
    np.testing.assert_allclose(mag_j, mag_t, rtol=1e-3, atol=1e-5)
    # batch-size invariance of the per-example normalization
    one = np.asarray(spectrogram_batch(jnp.asarray(x[:1])))
    np.testing.assert_allclose(one[0], mag_j[0], rtol=1e-6, atol=1e-7)


def test_demucs_sinc_resample_matches_torch_conv(rng):
    """upsample2's padded conv matches torch.nn.functional.conv1d semantics
    (ref: training/model.py:40-54)."""
    import math

    from musicfpaugment_tpu.core.resample import upsample2

    x = rng.standard_normal((1, 1, 512)).astype(np.float32)
    zeros = 56
    win = torch.hann_window(4 * zeros + 1, periodic=False)
    winodd = win[1::2]
    t = torch.linspace(-zeros + 0.5, zeros - 0.5, 2 * zeros) * math.pi
    kernel = (torch.where(t == 0, torch.tensor(1.0), torch.sin(t) / t) * winodd).view(
        1, 1, -1
    )
    xt = torch.tensor(x)
    out = torch.nn.functional.conv1d(xt.view(-1, 1, 512), kernel, padding=zeros)[
        ..., 1:
    ].view(1, 1, 512)
    y = torch.stack([xt, out], dim=-1).view(1, 1, -1).numpy()
    got = np.asarray(upsample2(jnp.asarray(x)))
    np.testing.assert_allclose(got, y, rtol=1e-3, atol=2e-5)


# ---------------------------------------------------------------- mxu fft


def test_mxu_fft_convolve_matches_numpy(rng):
    from musicfpaugment_tpu.core.mxu_fft import mxu_fft_convolve_full

    for m, n, N in [(100, 30, 256), (1000, 257, 4096), (5000, 513, 8192)]:
        x = rng.standard_normal((2, m)).astype(np.float32)
        k = rng.standard_normal((2, n)).astype(np.float32)
        got = np.asarray(
            mxu_fft_convolve_full(jnp.asarray(x), jnp.asarray(k), N)
        )[:, : m + n - 1]
        want = np.stack([np.convolve(x[i], k[i]) for i in range(2)])
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_mxu_dft_roundtrip(rng):
    from musicfpaugment_tpu.core.mxu_fft import _dft_mixed, radix_factors

    N = 4096
    factors = radix_factors(N)
    x = rng.standard_normal((3, N)).astype(np.float32)
    fr, fi = _dft_mixed(jnp.asarray(x), jnp.zeros_like(jnp.asarray(x)), factors, False)
    br, bi = _dft_mixed(fr, fi, factors, True)
    np.testing.assert_allclose(np.asarray(br) / N, x, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(bi) / N, 0.0, atol=1e-3)
