"""Shape/behavior tests for UNet and Demucs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from musicfpaugment_tpu.models import Demucs, UNet, rescale_params


def test_unet_shapes():
    model = UNet(1, 1, rate=0.05, base=16)
    x = jnp.zeros((2, 257, 94))  # 3 s @ 8 kHz spectrogram, n_fft 512 hop 256
    variables = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(variables, x)
    assert y.shape == x.shape


def test_unet_channel_plan():
    """Verify the 64->1024 channel plan of ref training/unet.py:77-95."""
    model = UNet(1, 1)
    x = jnp.zeros((1, 16, 16))
    variables = model.init(jax.random.PRNGKey(0), x)
    params = variables["params"]
    # inc first conv -> 64 channels; deepest Down -> 1024
    inc_kernel = params["DoubleConv_0"]["Conv_0"]["kernel"]
    assert inc_kernel.shape[-1] == 64
    deep = params["Down_3"]["DoubleConv_0"]["Conv_0"]["kernel"]
    assert deep.shape[-1] == 1024


def test_unet_train_mode_runs():
    model = UNet(1, 1, rate=0.05, base=8)
    x = jnp.zeros((2, 128, 64))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    y, mutated = model.apply(
        variables,
        x,
        train=True,
        mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert y.shape == x.shape
    assert "batch_stats" in mutated


def test_unet_odd_sizes():
    """Odd spectrogram dims must survive the maxpool/pad-fix path
    (ref: unet.py:59-62)."""
    model = UNet(1, 1, base=8)
    x = jnp.zeros((1, 257, 251))
    variables = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(variables, x)
    assert y.shape == x.shape


def test_demucs_valid_length():
    """valid_length formula parity (ref: model.py:268-284)."""
    model = Demucs()
    # independently computed with the published formula
    import math

    def oracle(length):
        length = math.ceil(length * 4)
        for _ in range(5):
            length = max(math.ceil((length - 8) / 4) + 1, 1)
        for _ in range(5):
            length = (length - 1) * 4 + 8
        return int(math.ceil(length / 4))

    for L in [1, 100, 8000, 24000, 24001]:
        assert model.valid_length(L) == oracle(L)


def test_demucs_forward_shape():
    model = Demucs(hidden=8, depth=3)  # small for test speed
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 4001), dtype=np.float64).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(variables, x)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_demucs_channel_first_input():
    model = Demucs(hidden=8, depth=2)
    x = jnp.zeros((1, 1, 2000))
    variables = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(variables, x)
    assert y.shape == (1, 1, 2000)


def test_demucs_rescale_params():
    model = Demucs(hidden=8, depth=2)
    x = jnp.zeros((1, 2000))
    variables = model.init(jax.random.PRNGKey(0), x)
    rescaled = rescale_params(variables["params"], reference=0.1)
    leaves_before = jax.tree_util.tree_leaves(variables["params"])
    leaves_after = jax.tree_util.tree_leaves(rescaled)
    assert len(leaves_before) == len(leaves_after)
    changed = any(
        a.shape == b.shape and not np.allclose(a, b)
        for a, b in zip(leaves_before, leaves_after)
    )
    assert changed
    # rescaled conv kernels should have std ~ sqrt(std_orig * reference)
    k = variables["params"]["Conv_0"]["kernel"]
    k2 = rescaled["Conv_0"]["kernel"]
    np.testing.assert_allclose(
        float(jnp.std(k2)), float(jnp.std(k) / jnp.sqrt(jnp.std(k) / 0.1)), rtol=1e-4
    )


@pytest.mark.slow
def test_demucs_normalization_invariance():
    """With normalize=True, scaling the input scales the output ~linearly
    (std is divided out then multiplied back, model.py:294-326)."""
    model = Demucs(hidden=8, depth=2)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 3000)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    y1 = np.asarray(model.apply(variables, x))
    y2 = np.asarray(model.apply(variables, 100.0 * x))
    # floor=1e-3 makes the invariance approximate, not exact
    scale = np.abs(100.0 * y1).max()
    np.testing.assert_allclose(y2, 100.0 * y1, atol=0.01 * scale)


@pytest.mark.slow
def test_unet_bf16_mixed_precision():
    """dtype=bfloat16 computes in bf16 but keeps f32 params and f32 output."""
    model = UNet(1, 1, rate=0.0, base=8, dtype=jnp.bfloat16)
    x = jnp.ones((1, 64, 32))
    variables = model.init(jax.random.PRNGKey(0), x)
    leaf = jax.tree_util.tree_leaves(variables["params"])[0]
    assert leaf.dtype == jnp.float32
    y = model.apply(variables, x)
    assert y.dtype == jnp.float32
    assert bool(jnp.isfinite(y).all())


@pytest.mark.slow
def test_demucs_bf16_close_to_f32():
    """VERDICT r2 #4: the bf16 mixed-precision option (params f32, compute
    bf16 through encoder/LSTM/decoder, f32 resampling) shares parameter
    structure with the f32 model and stays within bf16 rounding of it."""
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 8000)).astype(np.float32)
    )
    m32 = Demucs(hidden=8, depth=3)
    mbf = Demucs(hidden=8, depth=3, dtype=jnp.bfloat16)
    v = m32.init(jax.random.PRNGKey(0), x)
    y32 = m32.apply(v, x)
    ybf = mbf.apply(v, x)  # same params tree — drop-in switch
    assert ybf.dtype == jnp.float32  # output stays f32
    rel = float(jnp.max(jnp.abs(y32 - ybf)) / (jnp.max(jnp.abs(y32)) + 1e-9))
    assert rel < 0.05


def test_demucs_fused_frontend_matches_unfused():
    """fused_frontend=True (x4 upsample + first conv, and last ConvTranspose
    + x4 downsample, each as one stride-1 conv via the extracted phase
    bases) must match the unfused model on the SAME params — including the
    edge regions recomputed through the real unfused ops."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 4000)).astype(np.float32))
    m0 = Demucs()
    v = m0.init(jax.random.PRNGKey(0), x)
    m1 = Demucs(fused_frontend=True)
    y0 = np.asarray(m0.apply(v, x))
    y1 = np.asarray(m1.apply(v, x))
    assert y0.shape == y1.shape
    scale = max(np.abs(y0).max(), 1.0)
    np.testing.assert_allclose(y1 / scale, y0 / scale, atol=2e-5)
    # enc1 prefix parity (the fused first conv feeds the rest of the net)
    e0 = np.asarray(m0.apply(v, x, stop_at="enc1"))
    e1 = np.asarray(m1.apply(v, x, stop_at="enc1"))
    s = max(np.abs(e0).max(), 1.0)
    np.testing.assert_allclose(e1 / s, e0 / s, atol=2e-5)


@pytest.mark.slow
def test_demucs_fused_frontend_grads_finite():
    """The fused model trains: grads exist for every param (incl. the
    first conv / last ConvTranspose reached through the fused kernels)."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 4000)).astype(np.float32))
    m = Demucs(fused_frontend=True)
    v = m.init(jax.random.PRNGKey(0), x)

    def loss(params, x):
        return jnp.mean(jnp.abs(m.apply(params, x) - x))

    g = jax.grad(loss)(v, x)
    leaves = jax.tree_util.tree_leaves(g)
    assert leaves and all(bool(jnp.isfinite(l).all()) for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)
