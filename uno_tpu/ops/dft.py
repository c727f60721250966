"""Partial DFT transforms as MXU matmuls — the TPU-first spectral path.

The U-NO spectral conv keeps only ``m`` low-frequency modes of an ``S``-point
transform (reference ``integral_operators.py:181-207``): computing a full
(r)FFT and discarding ``S - m`` bins wastes nearly all of its work, and XLA's
TPU FFT is slow at the reference's non-power-of-two grids (measured ~6.6 ms
per 235^2 x 32ch rfft2+irfft2 roundtrip — the entire round-1 step time).

Since only ``m << S`` bins are needed, the transform is a *partial DFT*: a
``(m, S)`` matrix applied along one axis.  That is a small dense matmul the
MXU executes in tens of microseconds, and its autodiff transpose is again a
matmul, so the backward pass never touches an FFT either.  All matmuls run
with ``precision='highest'`` (f32-accurate 6-pass bf16 on TPU) so accuracy
matches the f32 FFT path (pinned by tests/test_dft.py).

Conventions match ``numpy.fft`` with ``norm="forward"`` (scale 1/n on the
forward transform, none on the inverse) as used by the spectral convs, and
the c2r inverse reproduces ``irfft`` semantics exactly: the imaginary parts
of the DC and Nyquist bins are discarded (the sin column is zero there) and
interior bins are doubled (hermitian completion).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_PREC = jax.lax.Precision.HIGHEST


@lru_cache(maxsize=None)
def _fwd_mats(n: int, idx: Tuple[int, ...], scaled: bool = True):
    """(cos, sin) of shape (len(idx), n): X[k] = sum_j x[j] e^{-2 pi i k j / n},
    divided by n when ``scaled`` (norm="forward" convention)."""
    k = np.asarray(idx, np.float64)[:, None]
    j = np.arange(n, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * k * j / n
    s = n if scaled else 1.0
    return (
        (np.cos(ang) / s).astype(np.float32),
        (np.sin(ang) / s).astype(np.float32),
    )


@lru_cache(maxsize=None)
def _inv_full_mats(n: int, idx: Tuple[int, ...], scaled: bool = False):
    """(cos, sin) of shape (len(idx), n): x[p] = sum_k X[k] e^{+2 pi i k p / n}.

    Unscaled by default (norm="forward"); ``scaled`` divides by n (the
    default/backward norm).  Frequencies outside ``idx`` are zero.
    """
    k = np.asarray(idx, np.float64)[:, None]
    p = np.arange(n, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * k * p / n
    s = n if scaled else 1.0
    return (np.cos(ang) / s).astype(np.float32), (
        np.sin(ang) / s
    ).astype(np.float32)


@lru_cache(maxsize=None)
def _inv_rfft_mats(m: int, n_out: int, scaled: bool = False):
    """(cos, sin) of shape (m, n_out) reproducing ``irfft`` from ``m`` leading
    half-spectrum bins: interior bins doubled, DC/Nyquist counted once with
    imaginary part dropped (sin row is identically zero there)."""
    l = np.arange(m, dtype=np.float64)[:, None]
    q = np.arange(n_out, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * l * q / n_out
    w = np.full((m, 1), 2.0)
    w[0, 0] = 1.0
    if n_out % 2 == 0 and m - 1 == n_out // 2:
        w[-1, 0] = 1.0
    if scaled:
        w /= n_out
    return (w * np.cos(ang)).astype(np.float32), (w * np.sin(ang)).astype(
        np.float32
    )


_LETTERS = "abcdefghij"


def _apply(x: Array, mat: np.ndarray, axis: int) -> Array:
    """Contract ``axis`` of x against rows of ``mat`` ((K, n) -> length K).

    One in-place einsum (no moveaxis) so XLA folds the axis permutation into
    the dot_general operand layout instead of materialising transposed copies
    of full-resolution activations.
    """
    ax = axis % x.ndim
    lhs = _LETTERS[: x.ndim]
    out = lhs[:ax] + "z" + lhs[ax + 1 :]
    y = jnp.einsum(
        f"{lhs},z{lhs[ax]}->{out}", x, mat, precision=_PREC
    )
    return y


def fwd_partial_real(
    x: Array, axis: int, n: int, idx: Sequence[int], scaled: bool = True
) -> Tuple[Array, Array]:
    """Forward partial DFT of a real array along ``axis`` at bins ``idx``."""
    c, s = _fwd_mats(n, tuple(idx), scaled)
    return _apply(x, c, axis), -_apply(x, s, axis)


def fwd_partial_complex(
    xr: Array, xi: Array, axis: int, n: int, idx: Sequence[int],
    scaled: bool = True,
) -> Tuple[Array, Array]:
    """Forward partial DFT of a complex array given as (re, im) planes."""
    c, s = _fwd_mats(n, tuple(idx), scaled)
    # (xr + i xi)(cos - i sin): re = xr c + xi s, im = xi c - xr s
    return (
        _apply(xr, c, axis) + _apply(xi, s, axis),
        _apply(xi, c, axis) - _apply(xr, s, axis),
    )


def inv_full(
    yr: Array, yi: Array, axis: int, n: int, idx: Sequence[int],
    scaled: bool = False,
) -> Tuple[Array, Array]:
    """Full inverse DFT from bins ``idx`` (all others zero); ``scaled``
    divides by n (default/backward norm)."""
    c, s = _inv_full_mats(n, tuple(idx), scaled)
    c, s = c.T, s.T  # (n, K): _apply contracts the K-length axis
    # (yr + i yi)(cos + i sin): re = yr c - yi s, im = yr s + yi c
    return (
        _apply(yr, c, axis) - _apply(yi, s, axis),
        _apply(yr, s, axis) + _apply(yi, c, axis),
    )


def inv_rfft(
    yr: Array, yi: Array, axis: int, n_out: int, scaled: bool = False
) -> Array:
    """Real inverse from the ``m`` leading half-spectrum bins along ``axis``
    (zero padding to n_out//2+1 implicit), matching ``irfft(..., n=n_out)``
    with norm="forward" (default) or the backward norm (``scaled``)."""
    m = yr.shape[axis]
    c, s = _inv_rfft_mats(m, n_out, scaled)
    c, s = c.T, s.T  # (n_out, m): _apply contracts the m-length axis
    return _apply(yr, c, axis) - _apply(yi, s, axis)
