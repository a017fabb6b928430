"""Per-stage timing of the Demucs train step on the chip (VERDICT r2 #4):
which of augment / resample / encoder convs / BLSTM / decoder dominates, at
f32 and bf16. Run: python examples/profile_demucs.py"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(name, fn, *args, iters=8):
    import jax

    def sync(out):
        # scalar readback only — np.asarray would download the whole tensor
        # through the remote tunnel and pollute the timing
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(leaf.ravel()[0])

    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _i in range(iters):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name}: {dt:.1f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from musicfpaugment_tpu.core.resample import upsample2
    from musicfpaugment_tpu.models import Demucs
    from musicfpaugment_tpu.models.demucs import BLSTM

    B, sr = 128, 8000
    n = 3 * sr
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, n)).astype(np.float32))
    _ = float(x[0, 0])

    for dtype, tag in ((None, "f32"), (jnp.bfloat16, "bf16")):
        for fused in (False, True):
            model = Demucs(dtype=dtype, fused_frontend=fused)
            ftag = f"{tag}{'+fused' if fused else ''}"
            v = model.init(jax.random.PRNGKey(0), x[:2])

            fwd = jax.jit(lambda v, x, model=model: model.apply(v, x))
            timeit(f"demucs[{ftag}] forward", fwd, v, x)

            def loss(v, x, model=model):
                y = model.apply(v, x)
                return jnp.mean(jnp.abs(y - x))

            grad = jax.jit(jax.grad(loss))
            timeit(f"demucs[{ftag}] fwd+bwd(L1)", grad, v, x)
        model = Demucs(dtype=dtype)
        v = model.init(jax.random.PRNGKey(0), x[:2])

        # BLSTM alone at the bottleneck shape (T after x4 resample, /4^5)
        t_btl = (n * 4) // (4**5)
        h = jnp.asarray(
            rng.standard_normal((B, t_btl, 768)).astype(np.float32)
        )
        _ = float(h[0, 0, 0])
        blstm = BLSTM(768, bi=False, dtype=dtype)
        bv = blstm.init(jax.random.PRNGKey(1), h[:2])
        bfwd = jax.jit(lambda v, x: blstm.apply(v, x))
        timeit(f"blstm[{tag}] forward (B={B}, T={t_btl}, 768)", bfwd, bv, h)

        def bloss(v, x):
            return jnp.mean(jnp.abs(blstm.apply(v, x)))

        bgrad = jax.jit(jax.grad(bloss))
        timeit(f"blstm[{tag}] fwd+bwd", bgrad, bv, h)

    # resample cost
    up = jax.jit(lambda x: upsample2(upsample2(x[:, None, :])))
    timeit("upsample2 x2 (f32)", up, x)

    # ------------------------------------------------- cumulative prefixes
    # Standalone per-stage jits mislead (XLA fuses differently in context);
    # the honest split is one jit per *prefix* of the real forward, marginal
    # cost = difference of consecutive prefixes. Same for the loss side:
    # fwd -> fwd+loss -> grad(fwd+loss).
    from musicfpaugment_tpu.train.losses import (
        l1_loss,
        multi_resolution_stft_loss,
    )

    print("--- cumulative prefix profile (f32) ---", flush=True)
    model = Demucs()
    v = model.init(jax.random.PRNGKey(0), x[:2])
    prev = 0.0
    for stop in ("frontend", "enc1", "enc", "lstm", "dec", None):
        fn = jax.jit(
            lambda v, x, s=stop: model.apply(v, x, stop_at=s)
        )
        dt = timeit(f"prefix..{stop or 'full'}", fn, v, x, iters=4)
        print(f"  marginal {stop or 'downsample+tail'}: {dt - prev:.1f} ms",
              flush=True)
        prev = dt

    def loss_fn(v, x):
        y = model.apply(v, x)
        sc, mag = multi_resolution_stft_loss(y, x)
        return l1_loss(y, x) + sc + mag

    dt_l = timeit("fwd+mrstft_loss", jax.jit(loss_fn), v, x, iters=4)
    print(f"  marginal mrstft_loss: {dt_l - prev:.1f} ms", flush=True)
    dt_g = timeit("grad(fwd+mrstft_loss)", jax.jit(jax.grad(loss_fn)), v, x,
                  iters=4)
    print(f"  marginal backward: {dt_g - dt_l:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
