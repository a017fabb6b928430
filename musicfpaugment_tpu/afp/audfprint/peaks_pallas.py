"""Pallas TPU kernels for the decaying-threshold peak pruner.

Fused alternative to the ``lax.scan`` implementations in ``peaks.py``: the
whole column loop runs inside one kernel with the threshold envelope resident
in registers/VMEM, the Gaussian bump table computed on the fly, and the
"spread the accepted peak" update expressed as a one-hot (BT, F) x (F, F)
matmul so the MXU does the gather.

Layout: spectrograms enter time-major (batch, cols, freq) so each column read
is a contiguous (BT, F) tile; F = n_fft/2 = 256 = two (8, 128) lanes. The
grid partitions (batch, column-tiles); the threshold envelope is carried
across column tiles in VMEM scratch (the grid's column axis is sequential),
so VMEM per step is (BT, COL_TILE, F) no matter how long the track is.

Semantics are identical to ``forward_prune`` / ``backward_prune`` (same
reference: afp/audfprint/peak_extractor.py:173-234) and covered by the same
oracle tests.
"""

from __future__ import annotations

import functools
from typing import Tuple

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


def _fwd_kernel(sgram_ref, out_ref, env_ref, *, a_dec, f_sd, maxpks, n_cols,
                col_tile):
    """One (BT, CT, F) block of the forward prune. The grid walks column
    tiles sequentially (dimension_semantics: batch parallel, columns
    arbitrary) with the decaying threshold envelope carried across tiles in
    VMEM scratch — this is what lets 30 s tracks (938 cols) keep the full
    BT=8 batch tile instead of shrinking the batch to fit whole rows in
    VMEM."""
    BT, CT, F = sgram_ref.shape
    j = pl.program_id(1)
    gauss = _gauss_table(F, f_sd)
    iota_f = jax.lax.broadcasted_iota(jnp.int32, (BT, F), 1)

    @pl.when(j == 0)
    def _init():
        env_ref[:, :] = _spread_init(
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

    # columns beyond n_cols (the pad tail of the last tile) are skipped:
    # their output is sliced away by the caller and must not decay the env
    valid = jnp.clip(n_cols - j * col_tile, 0, CT)
    env_ref[:, :] = jax.lax.fori_loop(0, valid, column, env_ref[:, :])


def _bwd_kernel(sgram_ref, peaks_ref, out_ref, env_ref, *, a_dec, f_sd,
                maxpks, n_cols, col_tile, n_col_tiles):
    """Backward prune over one column tile; the grid's column axis maps to
    tiles in REVERSE (index_map n_tiles-1-j) so the envelope scratch carries
    right-to-left, matching the scan semantics."""
    BT, CT, F = sgram_ref.shape
    j = pl.program_id(1)
    gauss = _gauss_table(F, f_sd)
    iota_f = jax.lax.broadcasted_iota(jnp.int32, (BT, F), 1)
    # absolute first column of this (reversed) tile, and its valid width
    tile_start = (n_col_tiles - 1 - j) * col_tile
    valid = jnp.clip(n_cols - tile_start, 0, CT)

    @pl.when(j == 0)
    def _init():
        # the last REAL column lives in this tile at local index valid-1
        # (dynamic indexing must address the ref; a dynamic_slice on the
        # loaded value has no Mosaic lowering)
        env_ref[:, :] = _spread_init(sgram_ref[:, valid - 1, :], gauss)

    def column(i, th):
        c = valid - 1 - i
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

    env_ref[:, :] = jax.lax.fori_loop(0, valid, column, env_ref[:, :])


COL_TILE = 256  # one column tile: (8, 256, 256) f32 = 2 MB per buffer


def _batch_tile(B: int) -> int:
    """Largest batch tile dividing B. The column grid keeps the per-step
    VMEM working set at (BT, COL_TILE, F) regardless of track length, so
    30 s tracks (938 cols) now run the same BT=8 as 8 s queries — the
    round-3 fallback of shrinking BT to fit whole rows cost ingest 4x."""
    for bt in (8, 4, 2, 1):
        if B % bt == 0:
            return bt
    return 1


def _pad_cols(tm: Array, CT: int) -> Tuple[Array, int]:
    B, C, F = tm.shape
    n_ct = -(-C // CT)
    pad = n_ct * CT - C
    if pad:
        tm = jnp.pad(tm, [(0, 0), (0, pad), (0, 0)])
    return tm, n_ct


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
    BT = _batch_tile(B)
    CT = COL_TILE
    tm, n_ct = _pad_cols(tm, CT)
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, a_dec=a_dec, f_sd=f_sd, maxpks=maxpks, n_cols=C,
            col_tile=CT,
        ),
        out_shape=jax.ShapeDtypeStruct((B, n_ct * CT, F), jnp.float32),
        grid=(B // BT, n_ct),
        in_specs=[
            pl.BlockSpec(
                (BT, CT, F), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (BT, CT, F), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((BT, F), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        interpret=interpret,
    )(tm)
    return jnp.swapaxes(out[:, :C, :], 1, 2) > 0.5


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
    BT = _batch_tile(B)
    CT = COL_TILE
    tm, n_ct = _pad_cols(tm, CT)
    pm, _ = _pad_cols(pm, CT)
    # the column grid axis maps to tiles right-to-left so the carried
    # envelope sees columns in scan (reverse-time) order
    rev = lambda i, j, n=n_ct: (i, n - 1 - j, 0)
    kept = pl.pallas_call(
        functools.partial(
            _bwd_kernel, a_dec=a_dec, f_sd=f_sd, maxpks=maxpks, n_cols=C,
            col_tile=CT, n_col_tiles=n_ct,
        ),
        out_shape=jax.ShapeDtypeStruct((B, n_ct * CT, F), jnp.float32),
        grid=(B // BT, n_ct),
        in_specs=[
            pl.BlockSpec((BT, CT, F), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((BT, CT, F), rev, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BT, CT, F), rev, memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((BT, F), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        interpret=interpret,
    )(tm, pm)
    kept = jnp.swapaxes(kept[:, :C, :], 1, 2) > 0.5
    kill = jnp.pad(kept, [(0, 0), (0, 0), (1, 0)])[..., :-1]
    return kept & ~kill
