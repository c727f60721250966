"""Partial DFT transforms as single MXU matmuls — the TPU-first spectral path.

The U-NO spectral conv keeps only ``m`` low-frequency modes of an ``S``-point
transform (reference ``integral_operators.py:181-207``): computing a full
(r)FFT and discarding ``S - m`` bins wastes nearly all of its work, and XLA's
TPU FFT is slow at the reference's non-power-of-two grids (measured ~6.6 ms
per 235^2 x 32ch rfft2+irfft2 roundtrip — the entire round-1 step time).

Since only ``m << S`` bins are needed, each transform is a *partial DFT*: a
small dense matrix applied along one axis.  That is a matmul the MXU executes
in tens of microseconds, and its autodiff transpose is again a matmul, so the
backward pass never touches an FFT either.

Round-3 fusion: complex arrays are carried as f32 with a **(re, im) plane
axis at position 2** (after batch and channel), and every stage — including
the complex ones — is ONE ``dot_general``: the cos/sin matrices are stacked
into 2x2 block tensors so the plane axis is contracted (or produced) by the
same dot that contracts the spatial axis.  Round 2 issued 2-4 dots per stage
(15 per 2D conv); this layout issues one per stage (5 per 2D conv), which
cuts dispatch count and raises per-dot arithmetic intensity.

All matmuls run with ``precision='highest'`` (f32-accurate multi-pass bf16 on
TPU) so accuracy matches the f32 FFT path (pinned by tests/test_dft.py).

Conventions match ``numpy.fft`` with ``norm="forward"`` (scale 1/n on the
forward transform, none on the inverse) as used by the spectral convs, and
the c2r inverse reproduces ``irfft`` semantics exactly: the imaginary parts
of the DC and Nyquist bins are discarded (their sin rows are zero) and
interior bins are doubled (hermitian completion).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_PREC = jax.lax.Precision.HIGHEST
_L = "abcdefgh"


def set_precision(prec) -> None:
    """Set the matmul precision of the DFT transforms.

    Default HIGHEST (f32-accurate multi-pass bf16) — measured free at the
    reference configs because the transforms are HBM-bound (PERF.md round
    3).  For throughput studies at high arithmetic intensity (large mode
    counts) DEFAULT (single-pass bf16) trades ~1e-3 relative error for the
    full MXU rate.  Accepts a jax.lax.Precision or its lowercase name.
    """
    global _PREC
    if isinstance(prec, str):
        prec = {
            "default": jax.lax.Precision.DEFAULT,
            "high": jax.lax.Precision.HIGH,
            "highest": jax.lax.Precision.HIGHEST,
        }[prec]
    _PREC = prec

# The (re, im) plane axis of packed complex arrays.  Spectral-conv data is
# (B, C, *spatial), so the plane axis slots in after channels and negative
# spatial-axis indices keep meaning the same spatial axis.
PLANE_AXIS = 2


def _cs(n: int, idx, n_out_div: float) -> tuple[np.ndarray, np.ndarray]:
    """cos/sin tables (len(idx), n) of angle 2*pi*k*j/n, divided by n_out_div."""
    k = np.asarray(idx, np.float64)[:, None]
    j = np.arange(n, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * k * j / n
    return (
        (np.cos(ang) / n_out_div).astype(np.float32),
        (np.sin(ang) / n_out_div).astype(np.float32),
    )


@lru_cache(maxsize=256)  # bounded: resolution sweeps otherwise accumulate host tables (ADVICE r2)
def _fwd_real_T(n: int, idx: tuple, scaled: bool) -> np.ndarray:
    """(n, 2, K) block: X[k] = sum_j x[j] e^{-2 pi i k j / n} (/n if scaled).

    Plane 0 rows are cos (re), plane 1 rows are -sin (im).
    """
    c, s = _cs(n, idx, float(n) if scaled else 1.0)
    return np.stack([c.T, -s.T], axis=1)  # (n, 2, K)


@lru_cache(maxsize=256)  # bounded: resolution sweeps otherwise accumulate host tables (ADVICE r2)
def _fwd_cplx_T(n: int, idx: tuple, scaled: bool) -> np.ndarray:
    """(2, n, 2, K) block for a forward DFT of packed-complex input.

    (xr + i xi)(cos - i sin): re = xr@c + xi@s, im = xi@c - xr@s.
    Layout T[p_in, j, p_out, k].
    """
    c, s = _cs(n, idx, float(n) if scaled else 1.0)
    ct, st = c.T, s.T  # (n, K)
    return np.stack(
        [np.stack([ct, -st], axis=1), np.stack([st, ct], axis=1)], axis=0
    )


@lru_cache(maxsize=256)  # bounded: resolution sweeps otherwise accumulate host tables (ADVICE r2)
def _inv_cplx_T(n: int, idx: tuple, scaled: bool) -> np.ndarray:
    """(2, K, 2, n) block for a full inverse DFT from bins ``idx`` (others
    zero): x[p] = sum_k X[k] e^{+2 pi i k p / n} (/n if scaled).

    (yr + i yi)(cos + i sin): re = yr@c - yi@s, im = yr@s + yi@c.
    Layout T[p_in, k, p_out, pos].
    """
    c, s = _cs(n, idx, float(n) if scaled else 1.0)  # (K, n)
    return np.stack(
        [np.stack([c, s], axis=1), np.stack([-s, c], axis=1)], axis=0
    )


@lru_cache(maxsize=256)  # bounded: resolution sweeps otherwise accumulate host tables (ADVICE r2)
def _inv_real_T(m: int, n_out: int, scaled: bool) -> np.ndarray:
    """(2, m, n_out) block reproducing ``irfft(..., n=n_out)`` from the ``m``
    leading half-spectrum bins: interior bins doubled, DC/Nyquist counted
    once with imaginary part dropped."""
    c, s = _cs(n_out, tuple(range(m)), float(n_out) if scaled else 1.0)
    w = np.full((m, 1), 2.0, np.float32)
    w[0, 0] = 1.0
    if n_out % 2 == 0 and m - 1 == n_out // 2:
        w[-1, 0] = 1.0
    return np.stack([w * c, -(w * s)], axis=0)  # (2, m, n_out)


def _dot(x: Array, T: np.ndarray, ein: str) -> Array:
    if x.dtype == jnp.bfloat16:
        # True mixed precision (round 3): bf16 operands at the native MXU
        # rate with f32 accumulation, output written back as bf16.  The
        # table cast constant-folds; the output convert fuses into the dot
        # epilogue, so the transform reads/writes HALF the bytes of the
        # f32 path — the win that matters on an HBM-bound step (PERF.md).
        # Round 2's bf16 policy was slower only because the old DFT path
        # forced f32 entry/exit conversions around each transform.
        y = jnp.einsum(
            ein,
            x,
            jnp.asarray(T).astype(jnp.bfloat16),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )
        return y.astype(jnp.bfloat16)
    return jnp.einsum(ein, x, T, precision=_PREC)


def fwd_real(
    x: Array, axis: int, n: int, idx: Sequence[int], scaled: bool = True
) -> Array:
    """Forward partial DFT of a real array along ``axis`` at bins ``idx``.

    x has NO plane axis; the result gains the (re, im) plane axis at
    position 2 and the transformed axis becomes length ``len(idx)``.
    One dot_general.
    """
    ax = axis % x.ndim
    lhs = _L[: x.ndim]
    out = lhs[:2] + "v" + lhs[2:ax] + "z" + lhs[ax + 1 :]
    ein = f"{lhs},{lhs[ax]}vz->{out}"
    return _dot(x, _fwd_real_T(n, tuple(idx), scaled), ein)


def _cplx_ein(ndim: int, ax: int) -> str:
    letters = list(_L[:ndim])
    letters[PLANE_AXIS] = "u"
    a = letters[ax]
    out = list(letters)
    out[PLANE_AXIS] = "v"
    out[ax] = "z"
    return f"{''.join(letters)},u{a}vz->{''.join(out)}"


def fwd_cplx(
    x: Array, axis: int, n: int, idx: Sequence[int], scaled: bool = True
) -> Array:
    """Forward partial DFT along ``axis`` of a packed-complex array (plane
    axis at position 2).  One dot_general contracting (plane, axis)."""
    ax = axis % x.ndim
    ein = _cplx_ein(x.ndim, ax)
    return _dot(x, _fwd_cplx_T(n, tuple(idx), scaled), ein)


def inv_cplx(
    x: Array, axis: int, n: int, idx: Sequence[int], scaled: bool = False
) -> Array:
    """Full inverse DFT along ``axis`` from bins ``idx`` (all others zero) of
    a packed-complex array; output axis has length ``n``.  ``scaled``
    divides by n (the default/backward norm).  One dot_general."""
    ax = axis % x.ndim
    ein = _cplx_ein(x.ndim, ax)
    return _dot(x, _inv_cplx_T(n, tuple(idx), scaled), ein)


def inv_real(
    x: Array, axis: int, n_out: int, scaled: bool = False
) -> Array:
    """Real inverse from the leading half-spectrum bins along ``axis`` of a
    packed-complex array (zero padding to n_out//2+1 implicit), matching
    ``irfft(..., n=n_out)`` with norm="forward" (default) or the backward
    norm (``scaled``).  Consumes the plane axis; one dot_general."""
    ax = axis % x.ndim
    m = x.shape[ax]
    letters = list(_L[: x.ndim])
    letters[PLANE_AXIS] = "u"
    a = letters[ax]
    out = [
        ("z" if i == ax else l)
        for i, l in enumerate(letters)
        if i != PLANE_AXIS
    ]
    ein = f"{''.join(letters)},u{a}z->{''.join(out)}"
    return _dot(x, _inv_real_T(m, n_out, scaled), ein)


# --- VJP transposes ---------------------------------------------------------
# Each forward transform is one dot against a constant table, so its vector-
# Jacobian transpose is again ONE dot against the SAME table with the
# contraction flipped.  The custom spectral-conv VJP (ops/spectral.py) uses
# these instead of letting autodiff transpose the einsums: XLA's transposed
# dots arrived in mismatched layouts and spent ~0.8 ms/step re-copying
# cotangents (round-4 profile, 'data formatting' rows at dft.py:142).


def t_fwd_real(
    g: Array, axis: int, n: int, idx: Sequence[int], scaled: bool = True
) -> Array:
    """Transpose of ``fwd_real``: packed cotangent (plane axis at 2, bins at
    ``axis``) -> real cotangent with the transformed axis restored to length
    ``n``.  One dot_general."""
    ax = axis % g.ndim
    letters = list(_L[: g.ndim])
    letters[PLANE_AXIS] = "u"
    letters[ax] = "z"
    out = [
        ("j" if i == ax else l)
        for i, l in enumerate(letters)
        if i != PLANE_AXIS
    ]
    ein = f"{''.join(letters)},juz->{''.join(out)}"
    return _dot(g, _fwd_real_T(n, tuple(idx), scaled), ein)


def t_fwd_cplx(
    g: Array, axis: int, n: int, idx: Sequence[int], scaled: bool = True
) -> Array:
    """Transpose of ``fwd_cplx`` along ``axis``.  One dot_general."""
    ax = axis % g.ndim
    letters = list(_L[: g.ndim])
    letters[PLANE_AXIS] = "v"
    letters[ax] = "z"
    out = list(letters)
    out[PLANE_AXIS] = "u"
    out[ax] = "j"
    ein = f"{''.join(letters)},ujvz->{''.join(out)}"
    return _dot(g, _fwd_cplx_T(n, tuple(idx), scaled), ein)


def t_inv_cplx(
    g: Array, axis: int, n: int, idx: Sequence[int], scaled: bool = False
) -> Array:
    """Transpose of ``inv_cplx``: cotangent with full axis ``n`` -> cotangent
    at the ``len(idx)`` kept bins.  One dot_general."""
    ax = axis % g.ndim
    letters = list(_L[: g.ndim])
    letters[PLANE_AXIS] = "v"
    letters[ax] = "z"
    out = list(letters)
    out[PLANE_AXIS] = "u"
    out[ax] = "k"
    ein = f"{''.join(letters)},ukvz->{''.join(out)}"
    return _dot(g, _inv_cplx_T(n, tuple(idx), scaled), ein)


def t_inv_real(
    g: Array, axis: int, m: int, n_out: int, scaled: bool = False
) -> Array:
    """Transpose of ``inv_real``: real cotangent (axis length ``n_out``) ->
    packed cotangent at the ``m`` leading half-spectrum bins (plane axis
    gained at position 2).  One dot_general."""
    ax = axis % g.ndim
    letters = list(_L[: g.ndim])
    letters[ax] = "z"
    out = list(letters)
    out[ax] = "k"
    out = out[:PLANE_AXIS] + ["u"] + out[PLANE_AXIS:]
    ein = f"{''.join(letters)},ukz->{''.join(out)}"
    return _dot(g, _inv_real_T(m, n_out, scaled), ein)


def pack(re: Array, im: Array) -> Array:
    """Stack (re, im) planes into the packed layout (plane axis at 2)."""
    return jnp.stack([re, im], axis=PLANE_AXIS)


def unpack(x: Array) -> tuple[Array, Array]:
    """Split a packed-complex array into its (re, im) planes."""
    idx0 = (slice(None),) * PLANE_AXIS + (0,)
    idx1 = (slice(None),) * PLANE_AXIS + (1,)
    return x[idx0], x[idx1]
