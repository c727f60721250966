"""torch-parity separable resampling as precomputed matmuls.

The reference resizes with ``F.interpolate`` (bicubic+antialias in 2D,
linear+antialias in 1D, trilinear in 3D — ``integral_operators.py:90-92,
240-242,465-467``; bilinear align_corners=True in the NS data loader,
``data_load_navier_stocks.py:43-54``).  torch's interpolate is separable, so
on TPU we precompute one (out, in) weight matrix per resized axis at trace
time (shapes are static under jit) and apply them as dense matmuls — MXU
work instead of gather/scatter, and bit-replicable against the torch
kernels.

The weight formulas were verified element-exact against torch 2.x:

* antialias path (both up- and down-sampling):
  ``scale = (in-1)/(out-1)`` if align_corners else ``in/out``;
  ``support = k/2 * max(scale, 1)``; ``center = scale*(i+0.5)``;
  window ``[int(center-support+0.5), int(center+support+0.5)) ∩ [0, in)``;
  ``w = filter((j - center + 0.5)/max(scale,1))`` normalised to sum 1.
  Filters: triangle (linear/bilinear/trilinear), cubic with A=-0.5
  (bicubic — note the aa path uses the PIL coefficient, not -0.75).
* non-antialias path: ``src = scale*i`` (align_corners) or
  ``scale*(i+0.5)-0.5`` (clamped to >=0 for linear, unclamped for cubic);
  2-tap triangle or 4-tap cubic with A=-0.75, indices edge-clamped.

Note: torch restricts ``antialias=True`` to 4-D bilinear/bicubic, so the
reference's ``pointwise_op_1D`` (linear+antialias, integral_operators.py:90)
raises at runtime — a latent reference bug.  Here antialias is supported
uniformly in every dimension.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_FILTER_SUPPORT = {"linear": 2, "cubic": 4, "nearest": 1}

_L = "abcdefgh"


def _mm(x: Array, wm: Array, ein: str) -> Array:
    """Resample einsum with the mixed-precision policy of ops/dft.py:_dot:
    bf16 activations keep bf16 operands/outputs (f32 accumulation) instead
    of promoting against the f32 table — under the bf16 policy a promoted
    f32 resample output doubled the W-path bytes AND de-bf16'd the whole
    block epilogue behind it (k+w, norm, gelu ran f32 — round-4 profile).
    ``UNO_TPU_F32_RESAMPLE=1`` restores the round-3 f32-promote semantics
    (the quality-bisection knob of RESULTS.md round 4)."""
    import os

    if os.environ.get("UNO_TPU_F32_RESAMPLE"):
        return jnp.einsum(ein, x.astype(jnp.float32), jnp.asarray(wm))
    if x.dtype == jnp.bfloat16:
        wb = jnp.asarray(wm).astype(jnp.bfloat16)
        if jax.default_backend() == "cpu":
            # XLA CPU's DotThunk can't run bf16xbf16->f32 in this layout
            # (same fallback as nn.layers.PointwiseOp): identical math —
            # bf16-rounded operands, f32 accumulation — phrased as an f32
            # dot.  The bf16 branch below is what the TPU step runs.
            y = jnp.einsum(ein, x.astype(jnp.float32), wb.astype(jnp.float32))
            return y.astype(jnp.bfloat16)
        y = jnp.einsum(
            ein, x, wb,
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )
        return y.astype(jnp.bfloat16)
    return jnp.einsum(ein, x, wm)


def _axis_mm_impl(x: Array, wm: Array, ax: int) -> Array:
    lhs = _L[: x.ndim]
    out = lhs[:ax] + "z" + lhs[ax + 1 :]
    return _mm(x, wm, f"{lhs},z{lhs[ax]}->{out}")


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _axis_mm(x: Array, wm: Array, ax: int) -> Array:
    """Apply a (out, in) resample matrix along axis ``ax`` in place.

    Hand-written VJP: the backward applies the transposed matrix via the
    same in-place einsum form, so XLA picks consistent layouts instead of
    re-copying cotangents (round-4 profile).  ``wm`` is a compile-time
    constant table — its cotangent is never consumed (zeros, DCE'd).
    """
    return _axis_mm_impl(x, wm, ax)


def _axis_mm_fwd(x, wm, ax):
    # dtype carried via a zero-size array (bare dtypes are not JAX types)
    proto = jnp.zeros((0,), x.dtype)
    return _axis_mm_impl(x, wm, ax), (x.shape[ax], proto, wm)


def _axis_mm_bwd(ax, res, g):
    n_in, proto, wm = res
    x_dt = proto.dtype
    lhs = _L[: g.ndim]
    out = lhs[:ax] + "z" + lhs[ax + 1 :]
    # cotangent must come back in the primal's dtype (g can be f32 when
    # the fwd promoted, e.g. under UNO_TPU_F32_RESAMPLE)
    gx = _mm(g, wm, f"{lhs},{lhs[ax]}z->{out}").astype(x_dt)
    return gx, jnp.zeros_like(wm)


_axis_mm.defvjp(_axis_mm_fwd, _axis_mm_bwd)


def _triangle(t: np.ndarray) -> np.ndarray:
    return np.clip(1.0 - np.abs(t), 0.0, None)


def _cubic(t: np.ndarray, a: float) -> np.ndarray:
    t = np.abs(t)
    return np.where(
        t <= 1.0,
        ((a + 2.0) * t - (a + 3.0)) * t * t + 1.0,
        np.where(t < 2.0, (((t - 5.0) * t + 8.0) * t - 4.0) * a, 0.0),
    )


@lru_cache(maxsize=256)  # bounded: resolution sweeps otherwise accumulate host tables (ADVICE r2)
def resize_matrix(
    n_in: int,
    n_out: int,
    kernel: str = "linear",
    align_corners: bool = True,
    antialias: bool = True,
) -> np.ndarray:
    """(n_out, n_in) float32 resampling matrix replicating torch interpolate."""
    if kernel == "nearest":
        scale = n_in / n_out
        idx = np.minimum((np.arange(n_out) * scale).astype(np.int64), n_in - 1)
        m = np.zeros((n_out, n_in), np.float64)
        m[np.arange(n_out), idx] = 1.0
        return m.astype(np.float32)

    if n_out > 1:
        scale = (n_in - 1) / (n_out - 1) if align_corners else n_in / n_out
    else:
        scale = 0.0 if align_corners else float(n_in)

    m = np.zeros((n_out, n_in), np.float64)
    if antialias:
        support_taps = _FILTER_SUPPORT[kernel]
        eff = max(scale, 1.0)
        support = support_taps * 0.5 * eff
        invscale = 1.0 / eff
        filt = _triangle if kernel == "linear" else (lambda t: _cubic(t, -0.5))
        for i in range(n_out):
            center = scale * (i + 0.5)
            xmin = max(int(center - support + 0.5), 0)
            xmax = min(int(center + support + 0.5), n_in)
            idx = np.arange(xmin, xmax)
            w = filt((idx - center + 0.5) * invscale)
            total = w.sum()
            if total > 0:
                w = w / total
            m[i, idx] = w
    else:
        for i in range(n_out):
            if align_corners:
                src = scale * i
            else:
                src = scale * (i + 0.5) - 0.5
                if kernel == "linear" and src < 0.0:
                    src = 0.0
            i0 = int(np.floor(src))
            f = src - i0
            if kernel == "linear":
                taps = np.array([i0, i0 + 1])
                w = np.array([1.0 - f, f])
            else:  # cubic, A=-0.75, 4 taps
                taps = np.arange(i0 - 1, i0 + 3)
                w = _cubic(taps - src, -0.75)
            taps = np.clip(taps, 0, n_in - 1)
            for j, wj in zip(taps, w):
                m[i, j] += wj
    return m.astype(np.float32)


def resize(
    x: Array,
    out_sizes: Sequence[int],
    axes: Sequence[int],
    kernel: str = "linear",
    align_corners: bool = True,
    antialias: bool = True,
) -> Array:
    """Resize ``x`` along ``axes`` to ``out_sizes`` (torch interpolate parity).

    Each axis is resampled by a dense (out, in) matrix contraction; axes whose
    size is unchanged under an identity-equivalent kernel are skipped.
    """
    assert len(out_sizes) == len(axes)
    dtype = x.dtype
    for ax, out_size in zip(axes, out_sizes):
        ax = ax % x.ndim
        n_in = x.shape[ax]
        if n_in == out_size:
            # scale == 1 makes every kernel's matrix the identity (the sample
            # grid maps onto itself under both align_corners conventions);
            # verified against torch in tests.
            continue
        wm = jnp.asarray(
            resize_matrix(n_in, out_size, kernel, align_corners, antialias)
        )
        if dtype == jnp.bfloat16:
            # mixed-precision policy: keep the resample matmul in bf16 (f32
            # matrices would silently promote the whole activation to f32)
            wm = wm.astype(jnp.bfloat16)
        if dtype == jnp.bfloat16 and jax.default_backend() == "cpu":
            # XLA CPU's DotThunk can't execute the in-place einsum layout
            # for bf16 — layout fallback only (same math)
            x = jnp.tensordot(x, wm, axes=[[ax], [1]])
            x = jnp.moveaxis(x, -1, ax)
        else:
            # einsum keeps the resized axis in place so XLA picks the
            # layout; tensordot+moveaxis forced a full-activation
            # transpose copy per resized axis (round-4 profile, ~0.3
            # ms/step at the Darcy headline).  Custom VJP: transposed
            # matrix, same einsum form.
            x = _axis_mm(x, wm, ax)
    return x.astype(dtype)
