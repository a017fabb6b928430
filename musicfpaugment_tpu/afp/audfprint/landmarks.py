"""Peak-pair landmarks and 20-bit hash packing — vectorized.

The reference forms landmarks with a triple-nested Python loop over peaks and
lookahead columns (ref: afp/audfprint/peak_extractor.py:313-346) and packs
hashes in numpy (:40-58). Here pairing is a dense (max_peaks, window) mask
computation: peaks are extracted from the boolean mask in (column, bin) order
into a fixed-size padded array, each peak looks at the next ``window`` peaks
(peak order == candidate order in the reference, since both iterate columns
ascending then bins ascending), validity is ``dt in [mindt, targetdt)`` and
``|df| < targetdf``, and the reference's fanout cap ("first
``maxpairsperpeak`` valid candidates") is a cumulative-sum rank test.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

# hash construction constants (ref: peak_extractor.py:99-108)
MAXPAIRSPERPEAK = 3
MINDT = 2
TARGETDT = 63
TARGETDF = 31


def extract_peaks(
    mask: Array, max_peaks: int
) -> Tuple[Array, Array, Array]:
    """(freq, cols) boolean mask -> (cols, bins, valid) padded to max_peaks,
    sorted by (col, bin) — the reference's pklist order
    (peak_extractor.py:305-310)."""
    F, C = mask.shape
    flat = jnp.reshape(jnp.swapaxes(mask, 0, 1), (-1,))  # column-major
    (idx,) = jnp.nonzero(flat, size=max_peaks, fill_value=-1)
    valid = idx >= 0
    safe = jnp.where(valid, idx, 0)
    return safe // F, safe % F, valid


def pair_landmarks(
    cols: Array,
    bins: Array,
    valid: Array,
    window: int = 320,
    mindt: int = MINDT,
    targetdt: int = TARGETDT,
    targetdf: int = TARGETDF,
    maxpairs: int = MAXPAIRSPERPEAK,
) -> Tuple[Array, Array]:
    """Pair each peak with up to ``maxpairs`` later peaks.

    Returns (landmarks (P, window, 4) int32 [col, bin1, bin2, dt],
    selected (P, window) bool). ``window`` bounds how many subsequent peaks
    are examined; with <= 5 peaks/frame and dt < 63, 315 suffices.
    """
    P = cols.shape[0]
    # candidate j = peak i + 1 + w
    offs = jnp.arange(1, window + 1)
    j = jnp.arange(P)[:, None] + offs[None, :]  # (P, W)
    in_range = j < P
    j_safe = jnp.where(in_range, j, P - 1)
    col_j = cols[j_safe]
    bin_j = bins[j_safe]
    val_j = valid[j_safe] & in_range
    dt = col_j - cols[:, None]
    df = bin_j - bins[:, None]
    ok = (
        valid[:, None]
        & val_j
        & (dt >= mindt)
        & (dt < targetdt)
        & (jnp.abs(df) < targetdf)
    )
    # "first maxpairs valid candidates" in j order (peak_extractor.py:334-345)
    rank = jnp.cumsum(ok.astype(jnp.int32), axis=1)
    selected = ok & (rank <= maxpairs)
    landmarks = jnp.stack(
        [
            jnp.broadcast_to(cols[:, None], dt.shape),
            jnp.broadcast_to(bins[:, None], dt.shape),
            bin_j,
            dt,
        ],
        axis=-1,
    ).astype(jnp.int32)
    return landmarks, selected


def pair_hashes(
    cols: Array,
    bins: Array,
    valid: Array,
    window: int = 320,
    mindt: int = MINDT,
    targetdt: int = TARGETDT,
    targetdf: int = TARGETDF,
    maxpairs: int = MAXPAIRSPERPEAK,
) -> Tuple[Array, Array, Array]:
    """Fused pairing + 20-bit hash packing: (times (P, W), hashes (P, W),
    selected (P, W)). Same selection semantics as :func:`pair_landmarks`, but
    the (P, W, 4) landmark tensor is never materialized — the hash is
    computed directly from dt/df (ref: peak_extractor.py:40-58), which
    matters when this runs vmapped over a query batch."""
    P = cols.shape[0]
    offs = jnp.arange(1, window + 1)
    j = jnp.arange(P)[:, None] + offs[None, :]  # (P, W)
    in_range = j < P
    j_safe = jnp.where(in_range, j, P - 1)
    dt = cols[j_safe] - cols[:, None]
    df = bins[j_safe] - bins[:, None]
    ok = (
        valid[:, None]
        & (valid[j_safe] & in_range)
        & (dt >= mindt)
        & (dt < targetdt)
        & (jnp.abs(df) < targetdf)
    )
    rank = jnp.cumsum(ok.astype(jnp.int32), axis=1)
    selected = ok & (rank <= maxpairs)
    h = ((bins[:, None] & 255) << 12) | ((df & 63) << 6) | (dt & 63)
    times = jnp.broadcast_to(cols[:, None], h.shape)
    return times, h, selected


def landmarks_to_hashes(landmarks: Array) -> Array:
    """(..., 4) [col, bin1, bin2, dt] -> (..., 2) [time, 20-bit hash]
    (ref: peak_extractor.py:40-58)."""
    time = landmarks[..., 0]
    bin1 = landmarks[..., 1]
    bin2 = landmarks[..., 2]
    dt = landmarks[..., 3]
    h = ((bin1 & 255) << 12) | (((bin2 - bin1) & 63) << 6) | (dt & 63)
    return jnp.stack([time, h], axis=-1)


def hashes_from_mask(
    mask: Array, max_peaks: int, max_hashes: int, window: int = 320
) -> Tuple[Array, Array]:
    """(freq, cols) peak mask -> padded, deduplicated, (time, hash)-sorted
    hash array ((max_hashes, 2) int32, valid (max_hashes,) bool).

    Deduplication + sort matches ``wavfile2hashes`` (peak_extractor.py:449-
    460): unique over the packed (time << 32 | hash) key, ascending. 64-bit
    packing is avoided (x64 stays off) by sorting on a float64-safe composite
    within int32 range: time * 2^20 + hash fits 34 bits, so we lexsort on two
    int32 keys instead.
    """
    cols, bins, valid = extract_peaks(mask, max_peaks)
    times, hashes, selected = pair_hashes(cols, bins, valid, window=window)
    th = jnp.stack([times.reshape(-1), hashes.reshape(-1)], axis=-1)
    sel = selected.reshape(-1)
    # compress the selected pairs into a fixed-size buffer
    (idx,) = jnp.nonzero(sel, size=max_hashes, fill_value=-1)
    lvalid = idx >= 0
    th = th[jnp.where(lvalid, idx, 0)]
    # sort by (time, hash): stable sort hash then time
    order_h = jnp.argsort(th[:, 1], stable=True)
    th = th[order_h]
    lvalid = lvalid[order_h]
    order_t = jnp.argsort(
        jnp.where(lvalid, th[:, 0], jnp.iinfo(jnp.int32).max), stable=True
    )
    th = th[order_t]
    lvalid = lvalid[order_t]
    # dedup consecutive equal (time, hash) rows
    same = (
        (th[1:, 0] == th[:-1, 0]) & (th[1:, 1] == th[:-1, 1]) & lvalid[1:]
    )
    unique = jnp.concatenate([jnp.array([True]), ~same])
    return th, lvalid & unique


def _lookahead(x: Array, window: int, fill) -> Array:
    """(B, P) -> (B, P, W) with out[b, i, w] = x[b, i + 1 + w] (``fill``
    past the end). Materialized via ``conv_general_dilated_patches`` — a
    sliding-window copy XLA lowers to efficient strided slices — instead of
    an integer gather on a (P, W) index grid, which the TPU backend executes
    as tens of millions of serialized random loads (measured ~25 s/batch in
    the vmapped hasher; this formulation is milliseconds)."""
    B, P = x.shape
    xpad = jnp.concatenate([x, jnp.full((B, window), fill, x.dtype)], axis=1)
    # values (cols < 2^12, bins < 2^8, bool) are exact in f32 (< 2^24)
    lhs = xpad[:, None, :].astype(jnp.float32)
    patches = jax.lax.conv_general_dilated_patches(
        lhs, filter_shape=(window + 1,), window_strides=(1,), padding="VALID"
    )  # (B, W+1, P); patches[:, k, i] = xpad[:, i + k]
    return jnp.transpose(patches[:, 1:, :], (0, 2, 1))


def sort_dedup_hashes(
    times: Array, hashes: Array, valid: Array
) -> Tuple[Array, Array, Array]:
    """Per-row (time, hash) ascending sort with invalid rows last, plus a
    consecutive-duplicate mask (ref dedup: peak_extractor.py:449-460).

    Gather-free: ``lax.sort`` with multiple operands moves the payload
    through the sorting network directly (an argsort + fancy-index gather
    executes as serialized random loads on TPU).
    """
    big = jnp.iinfo(jnp.int32).max
    k1 = jnp.where(valid, times, big)
    k2 = jnp.where(valid, hashes, big)
    k1, k2, times, hashes, valid = jax.lax.sort(
        (k1, k2, times, hashes, valid), dimension=-1, num_keys=2
    )
    dup = (
        (times[..., 1:] == times[..., :-1])
        & (hashes[..., 1:] == hashes[..., :-1])
        & valid[..., 1:]
    )
    pad = jnp.zeros(dup.shape[:-1] + (1,), bool)
    return times, hashes, valid & ~jnp.concatenate([pad, dup], axis=-1)


def compact_valid_first(
    times: Array, hashes: Array, valid: Array, out_len: int = 0
) -> Tuple[Array, Array, Array]:
    """Pack each row's valid (time, hash) entries to the front, preserving
    order, into an ``out_len``-wide buffer (default: same width).

    Replaces the stable sort-on-validity compaction: each valid entry's
    target slot is its rank (cumsum) — a scatter with provably unique
    indices (invalid entries get distinct out-of-range sentinels, the
    ``_bincount_rows`` trick), which runs ~3x faster than the 4-operand
    (B, K) sort it replaces. Valid entries past ``out_len`` are dropped by
    the scatter's bounds check; callers detect that via the returned count.

    Returns (times (B, out_len), hashes (B, out_len), n_valid (B,)) — slots
    at or past ``n_valid`` (clipped to out_len) are zero.
    """
    B, K = times.shape
    out_len = out_len or K
    ranks = jnp.cumsum(valid.astype(jnp.int32), axis=-1)
    pos = jnp.broadcast_to(jnp.arange(K)[None, :], (B, K))
    # Invalid sentinels live in [out_len + K, out_len + 2K): disjoint from
    # every possible valid rank (< K), so unique_indices=True holds even
    # when a row has more than out_len valid entries (overflow ranks in
    # [out_len, K) would otherwise collide with an out_len + pos sentinel).
    tgt = jnp.where(valid, ranks - 1, out_len + K + pos)
    bidx = jnp.arange(B)[:, None]
    t_out = jnp.zeros((B, out_len), times.dtype).at[bidx, tgt].set(
        times, mode="drop", unique_indices=True
    )
    h_out = jnp.zeros((B, out_len), hashes.dtype).at[bidx, tgt].set(
        hashes, mode="drop", unique_indices=True
    )
    return t_out, h_out, ranks[:, -1]


def hashes_from_masks_batched(
    masks: Array, max_peaks: int, max_hashes: int, window: int = 320
) -> Tuple[Array, Array]:
    """Batched (B, F, C) peak masks -> ((B, max_hashes, 2) int32 sorted
    deduplicated (time, hash) rows, (B, max_hashes) valid);
    ``max_hashes`` must be ``max_peaks * MAXPAIRSPERPEAK``.

    Whole-batch formulation of :func:`hashes_from_mask` (same semantics,
    asserted bit-equal in tests): peak extraction, W-lookahead pairing via
    sliding-window patches, fanout-cap rank test, hash packing, per-row
    (time, hash) sort + dedup. TPU-shaped: the fanout cap (<= 3 pairs per
    peak) compacts the (P, W) candidate grid to (P, 3) with three masked
    sums — no giant ``nonzero``/gather — and sorting is multi-operand
    ``lax.sort`` (gather-free).
    """
    assert max_hashes == max_peaks * MAXPAIRSPERPEAK
    B, F, C = masks.shape
    flat = jnp.reshape(jnp.swapaxes(masks, 1, 2), (B, -1))  # column-major

    def _nz(row):
        (idx,) = jnp.nonzero(row, size=max_peaks, fill_value=-1)
        return idx

    idx = jax.vmap(_nz)(flat)  # (B, P)
    valid = idx >= 0
    safe = jnp.where(valid, idx, 0)
    cols = safe // F
    bins = safe % F
    P = max_peaks

    # The W-lookahead pairing grid is processed in chunks of Wc offsets via a
    # scan with a carried per-peak pair count: live buffers are (B, P, Wc)
    # instead of (B, P, W) (~W/Wc x less HBM — the full grid is the first
    # thing to spill at large batch), while the global fanout-cap rank stays
    # exact because the carry threads the running count across chunks.
    Wc = 64
    n_chunks = -(-window // Wc)
    wpad = n_chunks * Wc
    cols_pad = jnp.concatenate([cols, jnp.zeros((B, wpad), cols.dtype)], axis=1)
    bins_pad = jnp.concatenate([bins, jnp.zeros((B, wpad), bins.dtype)], axis=1)
    valid_pad = jnp.concatenate(
        [valid, jnp.zeros((B, wpad), valid.dtype)], axis=1
    )

    def _chunk_lookahead(xpad, base):
        """(B, P + wpad) -> (B, P, Wc) with [b, i, w] = xpad[b, i + base + w],
        via strided patches (gather-free)."""
        seg = jax.lax.dynamic_slice_in_dim(xpad, base, P + Wc - 1, axis=1)
        lhs = seg[:, None, :].astype(jnp.float32)
        patches = jax.lax.conv_general_dilated_patches(
            lhs, filter_shape=(Wc,), window_strides=(1,), padding="VALID"
        )  # (B, Wc, P)
        return jnp.transpose(patches, (0, 2, 1))

    def step(carry, base):
        count, h_acc, v_acc = carry
        col_j = _chunk_lookahead(cols_pad, base + 1).astype(jnp.int32)
        bin_j = _chunk_lookahead(bins_pad, base + 1).astype(jnp.int32)
        val_j = _chunk_lookahead(valid_pad, base + 1) > 0.5
        # offsets beyond `window` in the padded final chunk must not pair
        offs = base + 1 + jnp.arange(Wc)
        in_window = offs <= window
        dt = col_j - cols[:, :, None]
        df = bin_j - bins[:, :, None]
        ok = (
            valid[:, :, None]
            & val_j
            & in_window[None, None, :]
            & (dt >= MINDT)
            & (dt < TARGETDT)
            & (jnp.abs(df) < TARGETDF)
        )
        rank = count[:, :, None] + jnp.cumsum(ok.astype(jnp.int32), axis=2)
        h = ((bins[:, :, None] & 255) << 12) | ((df & 63) << 6) | (dt & 63)
        for r in range(1, MAXPAIRSPERPEAK + 1):
            hit = ok & (rank == r)
            h_acc = h_acc.at[:, :, r - 1].add(
                jnp.sum(jnp.where(hit, h, 0), axis=2)
            )
            v_acc = v_acc.at[:, :, r - 1].set(
                v_acc[:, :, r - 1] | jnp.any(hit, axis=2)
            )
        return (count + jnp.sum(ok, axis=2), h_acc, v_acc), None

    init = (
        jnp.zeros((B, P), jnp.int32),
        jnp.zeros((B, P, MAXPAIRSPERPEAK), jnp.int32),
        jnp.zeros((B, P, MAXPAIRSPERPEAK), bool),
    )
    (_, h_acc, v_acc), _ = jax.lax.scan(
        step, init, jnp.arange(n_chunks) * Wc
    )

    hashes = h_acc.reshape(B, -1)  # (B, P*3)
    hvalid = v_acc.reshape(B, -1)
    times = jnp.broadcast_to(
        cols[:, :, None], (B, max_peaks, MAXPAIRSPERPEAK)
    ).reshape(B, -1)

    times, hashes, hvalid = sort_dedup_hashes(times, hashes, hvalid)
    return jnp.stack([times, hashes], axis=-1), hvalid


def hashes_from_mask_np(mask: np.ndarray) -> np.ndarray:
    """Host-side exact-size version: (freq, cols) mask -> (N, 2) int32 unique
    sorted (time, hash) pairs. Reference-faithful; used by the single-file
    API and as the oracle path."""
    F, C = mask.shape
    bins_f, cols_c = np.nonzero(mask)
    order = np.lexsort((bins_f, cols_c))
    cols_s, bins_s = cols_c[order], bins_f[order]
    P = len(cols_s)
    out = []
    for i in range(P):
        pairs = 0
        for j in range(i + 1, P):
            dt = cols_s[j] - cols_s[i]
            if dt >= TARGETDT:
                break
            if dt < MINDT:
                continue
            if abs(int(bins_s[j]) - int(bins_s[i])) < TARGETDF:
                h = (
                    ((int(bins_s[i]) & 255) << 12)
                    | (((int(bins_s[j]) - int(bins_s[i])) & 63) << 6)
                    | (dt & 63)
                )
                out.append((int(cols_s[i]), h))
                pairs += 1
                if pairs >= MAXPAIRSPERPEAK:
                    break
    if not out:
        return np.zeros((0, 2), np.int32)
    arr = np.asarray(out, np.int64)
    packed = (arr[:, 0] << 32) + arr[:, 1]
    uniq = np.unique(packed)
    return np.stack([uniq >> 32, uniq & 0xFFFFFFFF], axis=1).astype(np.int32)
