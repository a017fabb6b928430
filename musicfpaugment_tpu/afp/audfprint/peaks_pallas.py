"""Pallas TPU kernels for the decaying-threshold peak pruner.

Fused alternative to the ``lax.scan`` implementations in ``peaks.py``: the
whole column loop runs inside one kernel with the threshold envelope resident
in registers/VMEM, the Gaussian bump table computed on the fly, and the
"spread the accepted peak" update expressed as a one-hot (BT, F) x (F, F)
matmul so the MXU does the gather.

Layout: spectrograms enter time-major (batch, cols, freq) so each column read
is a contiguous (BT, F) tile; F = n_fft/2 = 256 = two (8, 128) lanes. The
grid partitions the batch; each program owns a BT-row block.

Semantics are identical to ``forward_prune`` / ``backward_prune`` (same
reference: afp/audfprint/peak_extractor.py:173-234) and covered by the same
oracle tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray


def _locmax(v: Array) -> Array:
    """locmax on the trailing axis (see peaks._locmax).

    Concatenation happens in f32 — Mosaic cannot relayout i1 vectors
    (bitcast_vreg i1 -> i32 is rejected)."""
    up = (v[..., 1:] >= v[..., :-1]).astype(jnp.float32)
    one = jnp.ones(v.shape[:-1] + (1,), jnp.float32)
    zero = jnp.zeros(v.shape[:-1] + (1,), jnp.float32)
    nbr_prev = jnp.concatenate([one, up], axis=-1)
    nbr_next = jnp.concatenate([up, zero], axis=-1)
    return (nbr_prev > 0.5) & (nbr_next < 0.5)


def _gauss_table(F: int, f_sd: float) -> Array:
    # iota must be integer-typed on TPU; cast afterwards
    r = jax.lax.broadcasted_iota(jnp.int32, (F, F), 0).astype(jnp.float32)
    c = jax.lax.broadcasted_iota(jnp.int32, (F, F), 1).astype(jnp.float32)
    return jnp.exp(-0.5 * ((c - r) / f_sd) ** 2)


def _spread_init(v: Array, gauss: Array) -> Array:
    mask = _locmax(v)
    vals = jnp.where(mask, v, -jnp.inf)
    bumps = vals[..., None] * gauss[None, :, :]
    return jnp.maximum(0.0, jnp.max(bumps, axis=-2))


def _fwd_kernel(sgram_ref, out_ref, *, a_dec, f_sd, maxpks, n_cols):
    BT, C, F = sgram_ref.shape
    gauss = _gauss_table(F, f_sd)
    iota_f = jax.lax.broadcasted_iota(jnp.int32, (BT, F), 1)
    th0 = _spread_init(
        jnp.max(sgram_ref[:, : min(10, n_cols), :], axis=1), gauss
    )

    def column(c, th):
        s = sgram_ref[:, c, :]
        cand = _locmax(s) & (s > th)
        vals = jnp.where(cand, s, -jnp.inf)
        peaks_col = jnp.zeros((BT, F), jnp.float32)

        for _ in range(maxpks):
            val = jnp.max(vals, axis=-1)
            pos = jnp.argmax(vals, axis=-1)
            accept = val > -jnp.inf
            onehot = iota_f == pos[:, None]
            peaks_col = jnp.where(
                onehot & accept[:, None], 1.0, peaks_col
            )
            # gather gauss[pos] as a one-hot matmul — MXU does the lookup
            bump_row = jnp.dot(
                jnp.where(onehot, 1.0, 0.0), gauss,
                preferred_element_type=jnp.float32,
            )
            bump = jnp.where(
                accept[:, None], val[:, None] * bump_row, -jnp.inf
            )
            th = jnp.maximum(th, bump)
            vals = jnp.where(onehot, -jnp.inf, vals)

        out_ref[:, c, :] = peaks_col
        return th * a_dec

    jax.lax.fori_loop(0, n_cols, column, th0)


def _bwd_kernel(sgram_ref, peaks_ref, out_ref, *, a_dec, f_sd, maxpks, n_cols):
    BT, C, F = sgram_ref.shape
    gauss = _gauss_table(F, f_sd)
    iota_f = jax.lax.broadcasted_iota(jnp.int32, (BT, F), 1)
    th0 = _spread_init(sgram_ref[:, n_cols - 1, :], gauss)

    def column(i, th):
        c = n_cols - 1 - i
        s = sgram_ref[:, c, :]
        vals = jnp.where(peaks_ref[:, c, :] > 0, s, -jnp.inf)
        kept = jnp.zeros((BT, F), jnp.float32)

        for _ in range(maxpks):
            val = jnp.max(vals, axis=-1)
            pos = jnp.argmax(vals, axis=-1)
            active = val > -jnp.inf
            onehot = iota_f == pos[:, None]
            th_at = jnp.max(jnp.where(onehot, th, -jnp.inf), axis=-1)
            keep = active & (val >= th_at)
            bump_row = jnp.dot(
                jnp.where(onehot, 1.0, 0.0), gauss,
                preferred_element_type=jnp.float32,
            )
            th = jnp.maximum(
                th,
                jnp.where(keep[:, None], val[:, None] * bump_row, -jnp.inf),
            )
            kept = jnp.where(onehot & keep[:, None], 1.0, kept)
            vals = jnp.where(onehot, -jnp.inf, vals)

        out_ref[:, c, :] = kept
        return th * a_dec

    jax.lax.fori_loop(0, n_cols, column, th0)


def _block(B: int, C: int, F: int, n_bufs: int) -> int:
    """Largest batch tile whose VMEM working set fits.

    Each grid step keeps ``n_bufs`` (BT, C, F) f32 blocks resident and the
    pipeline double-buffers them; the scoped-vmem budget is 16 MB. 8-second
    queries (C=251) get BT=8; 30-second tracks (C=938) drop to BT=2 — found
    the hard way: the full-depth scale ingest OOMed vmem at (8, 938, 256)."""
    budget = 12 * 2**20  # leave headroom under the 16 MB scoped limit
    for bt in (8, 4, 2, 1):
        if B % bt == 0 and bt * C * F * 4 * n_bufs * 2 <= budget:
            return bt
    return 1


@functools.partial(
    jax.jit, static_argnames=("a_dec", "f_sd", "maxpks", "interpret")
)
def forward_prune_pallas(
    sgram: Array, a_dec: float, f_sd: float = 30.0, maxpks: int = 5,
    interpret: bool = False,
) -> Array:
    """(B, F, C) log spectrogram -> (B, F, C) bool peaks, Pallas path."""
    B, F, C = sgram.shape
    tm = jnp.swapaxes(sgram, 1, 2)  # (B, C, F) time-major
    BT = _block(B, C, F, n_bufs=2)
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, a_dec=a_dec, f_sd=f_sd, maxpks=maxpks, n_cols=C
        ),
        out_shape=jax.ShapeDtypeStruct((B, C, F), jnp.float32),
        grid=(B // BT,),
        in_specs=[
            pl.BlockSpec((BT, C, F), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (BT, C, F), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(tm)
    return jnp.swapaxes(out, 1, 2) > 0.5


@functools.partial(
    jax.jit, static_argnames=("a_dec", "f_sd", "maxpks", "interpret")
)
def backward_prune_pallas(
    sgram: Array, peaks: Array, a_dec: float, f_sd: float = 30.0,
    maxpks: int = 5, interpret: bool = False,
) -> Array:
    """Backward prune + same-bin next-column kill (Pallas path)."""
    B, F, C = sgram.shape
    tm = jnp.swapaxes(sgram, 1, 2)
    pm = jnp.swapaxes(peaks, 1, 2).astype(jnp.float32)
    BT = _block(B, C, F, n_bufs=3)
    kept = pl.pallas_call(
        functools.partial(
            _bwd_kernel, a_dec=a_dec, f_sd=f_sd, maxpks=maxpks, n_cols=C
        ),
        out_shape=jax.ShapeDtypeStruct((B, C, F), jnp.float32),
        grid=(B // BT,),
        in_specs=[
            pl.BlockSpec((BT, C, F), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, C, F), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (BT, C, F), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(tm, pm)
    kept = jnp.swapaxes(kept, 1, 2) > 0.5
    kill = jnp.pad(kept, [(0, 0), (0, 0), (1, 0)])[..., :-1]
    return kept & ~kill
