"""Matmul (MXU) FFT for large batched convolutions.

XLA's native TPU FFT runs on the vector unit at a throughput-flat
~1 Gpt/s per pass regardless of size (measured on v5e) — it is the dominant
cost of the AugmentFP chain (three windowed-sinc stages + the IR convolution
are each 2-3 FFT passes of 2^17 x batch). The systolic array is idle the
whole time.

This module evaluates the DFT as a Cooley-Tukey 2-step decomposition
``N = N1 * N2`` whose butterflies are dense (N1, N1) / (N2, N2) complex
matmuls — i.e. the FFT runs *on the MXU*:

    x[n1*N2 + n2]  --DFT over n1-->  twiddle W_N^(n2*k1)  --DFT over n2-->
    C[k1, k2] == X[k2*N1 + k1]

For convolution the final digit-reversal permutation is unnecessary: the
frequency-domain product is elementwise, so signal and kernel spectra are
multiplied in the *permuted* (k1, k2) representation and the inverse
transform (conjugate matrices, 1/N scale) undoes everything. FLOP cost is
``8 * N * (N1 + N2)`` per signal — at N = 2^17, about 0.8 GFLOP, which the
MXU eats in tens of microseconds; the arrays stream at HBM bandwidth.

Matmuls run at ``precision=HIGHEST`` (f32-equivalent on TPU); round-trip
error at N = 2^17 is ~1e-5 relative.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

# HIGH (3-pass bf16, ~1e-5 relative DFT error at 2^17) is the speed choice;
# HIGHEST is f32-equivalent at ~2x the matmul cost.
_PREC = jax.lax.Precision.HIGH


@functools.lru_cache(maxsize=None)
def _dft_matrices(n: int, inverse: bool) -> Tuple[np.ndarray, np.ndarray]:
    """(n, n) DFT matrix W^(+-jk), float64-built, f32-stored."""
    k = np.arange(n)
    sign = 2j if inverse else -2j
    w = np.exp(sign * np.pi * np.outer(k, k) / n)
    return w.real.astype(np.float32), w.imag.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _twiddle(n1: int, n2: int, inverse: bool) -> Tuple[np.ndarray, np.ndarray]:
    """(n1, n2) twiddle table W_N^(+-k1*n2)."""
    sign = 2j if inverse else -2j
    w = np.exp(sign * np.pi * np.outer(np.arange(n1), np.arange(n2)) / (n1 * n2))
    return w.real.astype(np.float32), w.imag.astype(np.float32)


def _split_factors(n: int) -> Tuple[int, int]:
    """Pick N1 * N2 = n with both factors MXU-friendly (~sqrt split)."""
    n1 = 1 << (int(math.log2(n)) // 2)
    return n1, n // n1


def radix_factors(n: int, radix: int = 64) -> Tuple[int, ...]:
    """Decompose a power of two into MXU-friendly factors (radix first).

    FLOPs scale with sum(factors): [64, 64, 32] costs ~5x less than the
    sqrt split [256, 512] at n = 2^17.
    """
    factors = []
    while n > radix:
        factors.append(radix)
        n //= radix
    factors.append(n)
    return tuple(factors)


def _cmm_left(dr, di, xr, xi):
    """(D @ x) complex: D (K, N1), x (..., N1, N2)."""
    rr = jnp.einsum("kn,...nm->...km", dr, xr, precision=_PREC) - jnp.einsum(
        "kn,...nm->...km", di, xi, precision=_PREC
    )
    ri = jnp.einsum("kn,...nm->...km", dr, xi, precision=_PREC) + jnp.einsum(
        "kn,...nm->...km", di, xr, precision=_PREC
    )
    return rr, ri


def _cmm_right(xr, xi, dr, di):
    """(x @ D) complex: x (..., N1, N2), D (N2, K)."""
    rr = jnp.einsum("...nm,mk->...nk", xr, dr, precision=_PREC) - jnp.einsum(
        "...nm,mk->...nk", xi, di, precision=_PREC
    )
    ri = jnp.einsum("...nm,mk->...nk", xr, di, precision=_PREC) + jnp.einsum(
        "...nm,mk->...nk", xi, dr, precision=_PREC
    )
    return rr, ri


def _dft2(xr: Array, xi: Array, n1: int, n2: int, inverse: bool):
    """2-step DFT in the permuted spectral representation.

    Forward: input (..., n1, n2) row-major time (n = n1*n2dim... i.e.
    ``x[n1, n2] == x_flat[n1 * n2 + n2idx]``), output
    ``C[..., k1, k2] == X[..., k2 * n1 + k1]``.
    Inverse: exact inverse of the forward map (reversed step order with
    conjugate matrices and 1/N scaling) — time-domain row-major out.
    """
    d1r, d1i = _dft_matrices(n1, inverse)
    tr, ti = _twiddle(n1, n2, inverse)
    d2r, d2i = _dft_matrices(n2, inverse)
    if not inverse:
        ar, ai = _cmm_left(jnp.asarray(d1r), jnp.asarray(d1i), xr, xi)
        br = ar * tr - ai * ti
        bi = ar * ti + ai * tr
        return _cmm_right(br, bi, jnp.asarray(d2r), jnp.asarray(d2i))
    # inverse: undo step 3 (right matmul), then twiddle, then step 1 (left)
    ar, ai = _cmm_right(xr, xi, jnp.asarray(d2r), jnp.asarray(d2i))
    br = ar * tr - ai * ti
    bi = ar * ti + ai * tr
    cr, ci = _cmm_left(jnp.asarray(d1r), jnp.asarray(d1i), br, bi)
    scale = 1.0 / (n1 * n2)
    return cr * scale, ci * scale


def _dft_mixed(xr: Array, xi: Array, factors: Tuple[int, ...], inverse: bool):
    """Recursive mixed-radix DFT in a (fixed, self-consistent) permuted
    spectral representation. Input/output trailing axis has length
    prod(factors); the inverse exactly undoes the forward map."""
    if len(factors) == 1:
        # contract the last axis directly: leading dims fold into the matmul
        # M dimension (a dummy axis here would force M=1 matvecs on the MXU)
        dr, di = _dft_matrices(factors[0], inverse)
        dr = jnp.asarray(dr)
        di = jnp.asarray(di)
        rr = jnp.einsum("...l,lk->...k", xr, dr, precision=_PREC) - jnp.einsum(
            "...l,lk->...k", xi, di, precision=_PREC
        )
        ri = jnp.einsum("...l,lk->...k", xr, di, precision=_PREC) + jnp.einsum(
            "...l,lk->...k", xi, dr, precision=_PREC
        )
        return rr, ri
    f1 = factors[0]
    rest = int(np.prod(factors[1:]))
    shape = xr.shape[:-1]
    xr = xr.reshape(*shape, f1, rest)
    xi = xi.reshape(*shape, f1, rest)
    d1r, d1i = _dft_matrices(f1, inverse)
    tr, ti = _twiddle(f1, rest, inverse)
    if not inverse:
        ar, ai = _cmm_left(jnp.asarray(d1r), jnp.asarray(d1i), xr, xi)
        br = ar * tr - ai * ti
        bi = ar * ti + ai * tr
        cr, ci = _dft_mixed(br, bi, factors[1:], inverse)
    else:
        ar, ai = _dft_mixed(xr, xi, factors[1:], inverse)
        br = ar * tr - ai * ti
        bi = ar * ti + ai * tr
        cr, ci = _cmm_left(jnp.asarray(d1r), jnp.asarray(d1i), br, bi)
    return cr.reshape(*shape, f1 * rest), ci.reshape(*shape, f1 * rest)


def mxu_fft_convolve_full(signal: Array, kernel: Array, fft_size: int) -> Array:
    """Linear convolution via MXU DFTs at ``fft_size`` (must be >= m + n - 1
    and factorable as a power of two). Returns the first ``fft_size`` samples
    of the (zero-padded circular == linear) convolution on the trailing axis.

    ``signal``/``kernel`` broadcast on leading axes like fft_convolve.
    """
    factors = radix_factors(fft_size)

    def pad(x):
        cfg = [(0, 0)] * (x.ndim - 1) + [(0, fft_size - x.shape[-1])]
        return jnp.pad(x, cfg)

    sp = pad(signal)
    kp = pad(kernel)
    sr_, si_ = _dft_mixed(sp, jnp.zeros_like(sp), factors, False)
    kr_, ki_ = _dft_mixed(kp, jnp.zeros_like(kp), factors, False)
    pr = sr_ * kr_ - si_ * ki_
    pi = sr_ * ki_ + si_ * kr_
    yr, _ = _dft_mixed(pr, pi, factors, True)
    return yr * (1.0 / fft_size)
