"""Spectral (Fourier) integral operators — the numerical core of U-NO.

TPU-native re-design of the reference's ``SpectralConv{1,2,3}d_Uno``
(reference: ``integral_operators.py:7-72`` (1D), ``:127-207`` (2D),
``:287-427`` (3D)).  Behavioral contract preserved:

* ``norm="forward"`` on both FFT directions, so zero-padding / truncation in
  the Fourier domain acts as value-preserving trigonometric interpolation.
  This is what makes a single weight set resolution-invariant
  (reference ``integral_operators.py:56,71,187,206,398,424-426``).
* Only the low-|k| corner blocks of the (r)fft spectrum are multiplied by
  learned complex weights; the rest of the *output* spectrum is zero.  The
  output spectrum is sized by the requested output grid, so the same layer
  up- or down-samples the domain as a side effect of the inverse FFT.

TPU-first design notes (not a translation of the torch code):

* No mutable state — the output grid size is a pure, static argument
  (the reference statefully overwrites ``self.dim*`` at call time,
  ``integral_operators.py:52-53,182-184,391-394``; we do not replicate that).
* No scatter into a zero-filled buffer: the output spectrum is assembled
  with static ``concatenate``/``pad`` ops which XLA fuses, instead of the
  reference's ``out_ft[...] = ...`` in-place writes.
* The per-mode complex contraction ``bi...,io...->bo...`` is evaluated on
  real/imag planes via dot_general so the MXU sees real bf16/f32 matmuls
  (XLA complex matmul support is weaker on TPU).  FFTs stay in f32.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def default_modes_1d(dim1: int) -> int:
    """Reference default: ``modes1 = dim1 // 2`` (integral_operators.py:34)."""
    return dim1 // 2


def default_modes_2d(dim1: int, dim2: int) -> Tuple[int, int]:
    """Reference defaults (integral_operators.py:157-158)."""
    return dim1 // 2 - 1, dim2 // 2


def default_modes_3d(dim1: int, dim2: int, dim3: int) -> Tuple[int, int, int]:
    """Reference defaults (integral_operators.py:331-333)."""
    return dim1, dim2, dim3 // 2 + 1


def spectral_weight_init(
    key: jax.Array,
    in_codim: int,
    out_codim: int,
    mode_shape: Sequence[int],
    n_blocks: int,
    dtype=jnp.complex64,
) -> Array:
    """Initialise the stacked corner-block weights.

    Matches the reference init ``scale * randn(..., dtype=cfloat)`` with
    ``scale = (1/(2*in_codim))**0.5`` (integral_operators.py:36-39,159-175,
    335-379).  torch's complex ``randn`` draws re/im each from N(0, 1/2);
    we reproduce that so variances line up.

    Returns shape ``(n_blocks, in_codim, out_codim, *mode_shape)`` complex64,
    the ``n_blocks`` axis stacking what the reference keeps as separate
    ``weights1..weights4`` parameters.
    """
    scale = (1.0 / (2.0 * in_codim)) ** 0.5
    shape = (n_blocks, in_codim, out_codim, *mode_shape)
    kr, ki = jax.random.split(key)
    half = math.sqrt(0.5)
    re = jax.random.normal(kr, shape, jnp.float32) * half
    im = jax.random.normal(ki, shape, jnp.float32) * half
    return (scale * (re + 1j * im)).astype(dtype)


# Transform policy: None = auto (partial-DFT matmuls on TPU, FFT elsewhere),
# True/False = forced.  See ops/dft.py for why matmul DFT wins on the MXU.
_DFT_MODE = None


def set_dft_mode(enabled) -> None:
    """Force (True/False) or auto-select (None) the partial-DFT matmul path
    for the spectral transforms."""
    global _DFT_MODE
    _DFT_MODE = enabled


def _dft_enabled() -> bool:
    if _DFT_MODE is not None:
        return _DFT_MODE
    import os

    if os.environ.get("UNO_TPU_NO_DFT"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


# Pallas kernel policy: None = auto (TPU only), True/False = forced.
_PALLAS_MODE = None
_PALLAS_INTERPRET = False


def set_pallas_mode(enabled, interpret: bool = False) -> None:
    """Force (True/False) or auto-select (None) the Pallas mode-contraction
    kernel; ``interpret=True`` runs it in the Pallas interpreter (CPU tests)."""
    global _PALLAS_MODE, _PALLAS_INTERPRET
    _PALLAS_MODE = enabled
    _PALLAS_INTERPRET = interpret


def _pallas_enabled() -> bool:
    if _PALLAS_MODE is not None:
        return _PALLAS_MODE
    import os

    if os.environ.get("UNO_TPU_NO_PALLAS"):
        return False
    if os.environ.get("UNO_TPU_PALLAS"):
        try:
            return jax.default_backend() == "tpu"
        except Exception:
            return False
    # Off by default since round 2: with the partial-DFT transform path the
    # custom-call boundary costs more (layout copies + lost fusion) than the
    # kernel saves, and the XLA Karatsuba path at precision=HIGHEST matches
    # its accuracy (PERF.md round-2 measurements: 29.3 -> 26.3 ms/step).
    return False


def _complex_mode_matmul(x_ft: Array, w: Array) -> Array:
    """``einsum('bi...,io...->bo...')`` on complex inputs.

    x_ft: (B, Ci, *modes) complex; w: (Ci, Co, *modes) complex.
    Per Fourier mode this is an independent (B,Ci)x(Ci,Co) matmul.  On TPU a
    Pallas kernel puts modes in the lanes and contracts channels on the VPU
    (padded MXU batched-GEMMs run at a few % utilization at these sizes);
    elsewhere XLA gets one batched matmul per real component (Karatsuba).
    """
    mode_shape = x_ft.shape[2:]
    b, ci = x_ft.shape[:2]
    co = w.shape[1]
    m = int(np.prod(mode_shape)) if mode_shape else 1

    if _pallas_enabled():
        from uno_tpu.ops.pallas.cmul import complex_mode_matmul_pallas

        out = complex_mode_matmul_pallas(
            x_ft.reshape(b, ci, m), w.reshape(ci, co, m), _PALLAS_INTERPRET
        )
        return out.reshape(b, co, *mode_shape)

    # (B, Ci, M) -> (M, B, Ci);  (Ci, Co, M) -> (M, Ci, Co)
    xr = jnp.moveaxis(x_ft.reshape(b, ci, m), -1, 0)
    wr = jnp.moveaxis(w.reshape(ci, co, m), -1, 0)

    xa, xb = jnp.real(xr), jnp.imag(xr)
    wa, wb = jnp.real(wr), jnp.imag(wr)

    dn = (((2,), (1,)), ((0,), (0,)))  # contract Ci; batch over modes

    def bmm(u, v):
        # HIGHEST: f32-accurate multi-pass bf16 on TPU.  The mode counts are
        # tiny, so full precision here is ~free and avoids the ~4e-3 error of
        # single-pass bf16 complex contractions (PERF.md).
        return jax.lax.dot_general(
            u, v, dn,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    # Karatsuba: 3 real batched GEMMs instead of 4.
    t1 = bmm(xa, wa)
    t2 = bmm(xb, wb)
    t3 = bmm(xa + xb, wa + wb)
    out = jax.lax.complex(t1 - t2, t3 - t1 - t2)  # (M, B, Co)

    out = jnp.moveaxis(out, 0, -1).reshape(b, co, *mode_shape)
    return out


def _w_blocks(w: Array) -> Array:
    """2x2 block tensor of a complex weight: blk[p_in, q_out] with
    out_q = sum_p x_p @ blk[p, q].  Shape (2, 2, Ci, Co, *modes) f32."""
    wr = jnp.real(w).astype(jnp.float32)
    wi = jnp.imag(w).astype(jnp.float32)
    return jnp.stack(
        [jnp.stack([wr, wi], axis=0), jnp.stack([-wi, wr], axis=0)], axis=0
    )


def _blk_einsum(ein: str, a: Array, blk: Array) -> Array:
    if a.dtype == jnp.bfloat16:
        return jnp.einsum(
            ein, a, blk.astype(jnp.bfloat16),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)
    return jnp.einsum(
        ein, a, blk,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def _cmul_planes(xp: Array, w: Array) -> Array:
    """Complex mode contraction on packed-plane data as ONE dot_general.

    xp: (B, Ci, 2, *modes) f32 or bf16 (plane axis at dft.PLANE_AXIS);
    w:  (Ci, Co, *modes) complex64.
    Returns (B, Co, 2, *modes): per-mode complex matmul over Ci, expressed
    with a 2x2 block weight tensor so both output planes come out of a
    single dot (4 real products; the mode counts are tiny, so one dot of
    4/3 the FLOPs beats round 2's three Karatsuba dots on dispatch count).
    bf16 inputs (the mixed-precision policy) run at the native MXU rate
    with f32 accumulation; params stay f32 — only the compute cast is bf16.
    """
    ms = "xyz"[: w.ndim - 2]
    return _blk_einsum(f"aiu{ms},uvio{ms}->aov{ms}", xp, _w_blocks(w))


def _cmul_planes_t(g: Array, w: Array) -> Array:
    """Transpose of ``_cmul_planes`` w.r.t. its input (same blk tensor,
    contraction flipped).  One dot_general."""
    ms = "xyz"[: w.ndim - 2]
    return _blk_einsum(f"aov{ms},uvio{ms}->aiu{ms}", g, _w_blocks(w))


def _cmul_grad_w(xp: Array, g: Array) -> Array:
    """Cotangent of ``_cmul_planes`` w.r.t. the complex weight.

    Returns complex64 in the JAX convention (dL/dRe - i dL/dIm — the
    conjugate of torch's; uno_tpu.optim.complex_adam conjugates it back,
    tests/test_optim.py).  f32 accumulation in both precisions.
    """
    ms = "xyz"[: xp.ndim - 3]
    prec = (
        jax.lax.Precision.DEFAULT
        if xp.dtype == jnp.bfloat16
        else jax.lax.Precision.HIGHEST
    )
    gblk = jnp.einsum(
        f"aiu{ms},aov{ms}->uvio{ms}", xp, g,
        precision=prec, preferred_element_type=jnp.float32,
    )
    dwr = gblk[0, 0] + gblk[1, 1]
    dwi = gblk[0, 1] - gblk[1, 0]
    return jax.lax.complex(dwr, -dwi)


def _zeros_c(shape) -> Array:
    return jnp.zeros(shape, jnp.complex64)


# --- DFT-path convs with a custom VJP ---------------------------------------
# Every stage of the DFT path is one dot against a constant table, so the
# backward pass is hand-written as the mirrored chain of transposed dots
# (dft.t_*) instead of autodiff's transposed einsums: XLA chose mismatched
# layouts for those and spent ~0.8 ms/step on cotangent re-copies at the
# Darcy headline config (round-4 profile).  The weight cotangent follows
# the JAX complex convention (conjugate of torch's — see _cmul_grad_w);
# parity with the autodiff FFT path is pinned by tests/test_spectral.py and
# the golden train-step tests.


def _keep_idx(m: int, d: int):
    """Output-spectrum row bookkeeping for one +/- mode axis: the positive
    block keeps its first min(m, d-m) rows (the reference's overlapping
    corner writes are last-write-wins, integral_operators.py:198-203)."""
    n_keep = min(m, d - m)
    return n_keep, tuple(range(n_keep)) + tuple(range(d - m, d))


def _slice_pm(out: Array, axis: int, m: int, n_keep: int) -> Array:
    """Keep rows [:n_keep] and [m:] of a +/- stacked mode axis."""
    lo = jax.lax.slice_in_dim(out, 0, n_keep, axis=axis)
    hi = jax.lax.slice_in_dim(out, m, 2 * m, axis=axis)
    return jnp.concatenate([lo, hi], axis=axis)


def _unslice_pm(g: Array, axis: int, m: int, n_keep: int) -> Array:
    """Transpose of ``_slice_pm``: scatter kept-row cotangents back to the
    2m-row layout (dropped rows get zeros)."""
    ax = axis % g.ndim
    lo = jax.lax.slice_in_dim(g, 0, n_keep, axis=ax)
    hi = jax.lax.slice_in_dim(g, n_keep, g.shape[ax], axis=ax)
    if m - n_keep:
        shape = list(g.shape)
        shape[ax] = m - n_keep
        mid = jnp.zeros(shape, g.dtype)
        return jnp.concatenate([lo, mid, hi], axis=ax)
    return jnp.concatenate([lo, hi], axis=ax)


def _dft_conv1d_impl(x, w, d1, m1):
    from uno_tpu.ops import dft

    n = x.shape[-1]
    xp = dft.fwd_real(_dft_in(x), -1, n, range(m1))
    out = _cmul_planes(xp, w)
    return dft.inv_real(out, -1, d1), xp


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _dft_conv1d(x, w, d1, m1, in_size, xdtype):
    return _dft_conv1d_impl(x, w, d1, m1)[0]


def _dft_conv1d_fwd(x, w, d1, m1, in_size, xdtype):
    y, xp = _dft_conv1d_impl(x, w, d1, m1)
    return y, (xp, w)


def _dft_conv1d_bwd(d1, m1, in_size, xdtype, res, g):
    from uno_tpu.ops import dft

    xp, w = res
    gout = dft.t_inv_real(_dft_in(g), -1, m1, d1)
    gx = dft.t_fwd_real(
        _cmul_planes_t(gout, w), -1, in_size[-1], range(m1)
    )
    return gx.astype(xdtype), _cmul_grad_w(xp, gout)


_dft_conv1d.defvjp(_dft_conv1d_fwd, _dft_conv1d_bwd)


def _ci_splits(parts, w):
    """Channel offsets partitioning ``w``'s Ci axis across input parts."""
    sizes = [p.shape[1] for p in parts]
    assert sum(sizes) == w.shape[0], (sizes, w.shape)
    offs = [0]
    for s in sizes:
        offs.append(offs[-1] + s)
    return offs


def _dft_conv2d_impl(x, w, out_size, modes):
    """x may be a tuple of channel pieces (a fused skip-concat): the
    transforms run per piece and the mode contraction sums the pieces'
    contributions against the matching Ci rows of ``w`` — identical math
    to transforming the concatenated tensor (transforms are per-channel,
    the contraction is linear in Ci), without ever materializing the
    concat in HBM (round-5 profile: ~0.7 ms / ~0.7 GB per Darcy step)."""
    from uno_tpu.ops import dft

    d1, d2 = out_size
    m1, m2 = modes
    parts = x if isinstance(x, tuple) else (x,)
    h, w_in = parts[0].shape[-2], parts[0].shape[-1]
    rows = tuple(range(m1)) + tuple(range(h - m1, h))
    offs = _ci_splits(parts, w)
    xps = []
    out = None
    for i, p in enumerate(parts):
        xp = dft.fwd_real(_dft_in(p), -2, h, rows)
        xp = dft.fwd_cplx(xp, -1, w_in, range(m2))
        xps.append(xp)
        o = _cmul_planes(xp, w[offs[i] : offs[i + 1]])  # (B, Co, 2, 2*m1, m2)
        out = o if out is None else out + o
    n_top, idx_out = _keep_idx(m1, d1)
    kept = _slice_pm(out, -2, m1, n_top)
    yp = dft.inv_cplx(kept, -2, d1, idx_out)
    return dft.inv_real(yp, -1, d2), tuple(xps)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _dft_conv2d(x, w, out_size, modes, in_size, xdtype):
    return _dft_conv2d_impl(x, w, out_size, modes)[0]


def _dft_conv2d_fwd(x, w, out_size, modes, in_size, xdtype):
    y, xps = _dft_conv2d_impl(x, w, out_size, modes)
    return y, (xps, w)


def _dft_conv2d_bwd(out_size, modes, in_size, xdtype, res, g):
    from uno_tpu.ops import dft

    d1, d2 = out_size
    m1, m2 = modes
    xps, w = res
    h, w_in = in_size[-2], in_size[-1]
    rows = tuple(range(m1)) + tuple(range(h - m1, h))
    n_top, idx_out = _keep_idx(m1, d1)
    gyp = dft.t_inv_real(_dft_in(g), -1, m2, d2)
    gkept = dft.t_inv_cplx(gyp, -2, d1, idx_out)
    gout = _unslice_pm(gkept, -2, m1, n_top)
    offs = [0]
    for xp in xps:
        offs.append(offs[-1] + xp.shape[1])
    gxs = []
    gws = []
    for i, xp in enumerate(xps):
        gxp = _cmul_planes_t(gout, w[offs[i] : offs[i + 1]])
        gxp = dft.t_fwd_cplx(gxp, -1, w_in, range(m2))
        gxs.append(dft.t_fwd_real(gxp, -2, h, rows).astype(xdtype))
        gws.append(_cmul_grad_w(xp, gout))
    gw = gws[0] if len(gws) == 1 else jnp.concatenate(gws, axis=0)
    gx = tuple(gxs) if len(gxs) > 1 else gxs[0]
    return gx, gw


_dft_conv2d.defvjp(_dft_conv2d_fwd, _dft_conv2d_bwd)


def _dft_conv3d_impl(x, w, out_size, modes):
    from uno_tpu.ops import dft

    d1, d2, d3 = out_size
    m1, m2, m3 = modes
    sx, sy, t_in = x.shape[-3], x.shape[-2], x.shape[-1]
    rows_x = tuple(range(m1)) + tuple(range(sx - m1, sx))
    rows_y = tuple(range(m2)) + tuple(range(sy - m2, sy))
    xp = dft.fwd_real(_dft_in(x), -1, t_in, range(m3))
    xp = dft.fwd_cplx(xp, -3, sx, rows_x)
    xp = dft.fwd_cplx(xp, -2, sy, rows_y)
    out = _cmul_planes(xp, w)  # (B, Co, 2, 2*m1, 2*m2, m3)
    n_x, idx_x = _keep_idx(m1, d1)
    n_y, idx_y = _keep_idx(m2, d2)
    kept = _slice_pm(out, -3, m1, n_x)
    kept = _slice_pm(kept, -2, m2, n_y)
    yp = dft.inv_cplx(kept, -3, d1, idx_x)
    yp = dft.inv_cplx(yp, -2, d2, idx_y)
    return dft.inv_real(yp, -1, d3), xp


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _dft_conv3d(x, w, out_size, modes, in_size, xdtype):
    return _dft_conv3d_impl(x, w, out_size, modes)[0]


def _dft_conv3d_fwd(x, w, out_size, modes, in_size, xdtype):
    y, xp = _dft_conv3d_impl(x, w, out_size, modes)
    return y, (xp, w)


def _dft_conv3d_bwd(out_size, modes, in_size, xdtype, res, g):
    from uno_tpu.ops import dft

    d1, d2, d3 = out_size
    m1, m2, m3 = modes
    xp, w = res
    sx, sy, t_in = in_size[-3], in_size[-2], in_size[-1]
    rows_x = tuple(range(m1)) + tuple(range(sx - m1, sx))
    rows_y = tuple(range(m2)) + tuple(range(sy - m2, sy))
    n_x, idx_x = _keep_idx(m1, d1)
    n_y, idx_y = _keep_idx(m2, d2)
    gyp = dft.t_inv_real(_dft_in(g), -1, m3, d3)
    gyp = dft.t_inv_cplx(gyp, -2, d2, idx_y)
    gkept = dft.t_inv_cplx(gyp, -3, d1, idx_x)
    gout = _unslice_pm(gkept, -2, m2, n_y)
    gout = _unslice_pm(gout, -3, m1, n_x)
    gxp = _cmul_planes_t(gout, w)
    gxp = dft.t_fwd_cplx(gxp, -2, sy, rows_y)
    gxp = dft.t_fwd_cplx(gxp, -3, sx, rows_x)
    gx = dft.t_fwd_real(gxp, -1, t_in, range(m3))
    return gx.astype(xdtype), _cmul_grad_w(xp, gout)


_dft_conv3d.defvjp(_dft_conv3d_fwd, _dft_conv3d_bwd)


def _dft_in(x: Array) -> Array:
    """Compute dtype entering the DFT transforms: bf16 stays bf16 (the
    mixed-precision policy — transforms run at the MXU bf16 rate with f32
    accumulation), everything else computes in f32."""
    return x if x.dtype == jnp.bfloat16 else x.astype(jnp.float32)


def spectral_conv_1d(
    x: Array, weights: Array, out_size: int, modes: int
) -> Array:
    """1D spectral conv.  x: (B, Ci, N) real -> (B, Co, out_size) real.

    weights: (1, Ci, Co, modes) complex64.
    Reference behavior: integral_operators.py:47-72.
    """
    d1 = out_size
    m1 = modes
    if m1 > x.shape[-1] // 2 + 1 or m1 > d1 // 2 + 1:
        raise ValueError(
            f"modes1={m1} incompatible with input {x.shape[-1]} / output {d1}"
        )
    if _dft_enabled():
        return _dft_conv1d(x, weights[0], d1, m1, x.shape[-1:], x.dtype.name)
    x_ft = jnp.fft.rfft(x.astype(jnp.float32), norm="forward")
    out_low = _complex_mode_matmul(x_ft[:, :, :m1], weights[0])
    b, co = out_low.shape[:2]
    tail = d1 // 2 + 1 - m1
    out_ft = jnp.concatenate([out_low, _zeros_c((b, co, tail))], axis=-1)
    return jnp.fft.irfft(out_ft, n=d1, norm="forward")


def spectral_conv_2d(
    x: Array, weights: Array, out_size: Tuple[int, int], modes: Tuple[int, int]
) -> Array:
    """2D spectral conv.  x: (B, Ci, H, W) real -> (B, Co, d1, d2) real.

    weights: (2, Ci, Co, m1, m2) complex64 — block 0 multiplies the
    ``[:m1, :m2]`` (non-negative kx) corner, block 1 the ``[-m1:, :m2]``
    (negative kx) corner of the rfft2 spectrum
    (reference integral_operators.py:198-203).
    """
    d1, d2 = out_size
    m1, m2 = modes
    parts = x if isinstance(x, tuple) else (x,)
    h = parts[0].shape[-2]
    if m1 > d1 or m1 > h or m2 > d2 // 2 + 1 or m2 > parts[0].shape[-1] // 2 + 1:
        raise ValueError(
            f"modes {modes} incompatible with in {parts[0].shape} out {out_size}"
        )

    w = jnp.concatenate([weights[0], weights[1]], axis=2)  # (Ci, Co, 2*m1, m2)

    if _dft_enabled():
        return _dft_conv2d(
            x, w, (d1, d2), (m1, m2), parts[0].shape[-2:],
            parts[0].dtype.name,
        )

    # FFT fallback path: per-part transforms + Ci-sliced contraction summed
    # (same fused-skip linearity as the DFT path above)
    offs = _ci_splits(parts, w)
    out = None
    for i, p in enumerate(parts):
        x_ft = jnp.fft.rfft2(p.astype(jnp.float32), norm="forward")
        corners = jnp.concatenate(
            [x_ft[:, :, :m1, :m2], x_ft[:, :, h - m1 :, :m2]], axis=2
        )  # (B, Ci_k, 2*m1, m2)
        o = _complex_mode_matmul(corners, w[offs[i] : offs[i + 1]])
        out = o if out is None else out + o
    out_top, out_bot = out[:, :, :m1], out[:, :, m1:]

    # Assemble the zero-embedded output rows.  When 2*m1 > d1 the reference's
    # in-place corner writes overlap and the negative-kx block (written last)
    # wins — reproduced by keeping only the first d1-m1 rows of the positive
    # block (integral_operators.py:198-203 write order).
    b, co = out.shape[:2]
    n_top = min(m1, d1 - m1)
    mid = _zeros_c((b, co, d1 - m1 - n_top, m2))
    out_ft = jnp.concatenate([out_top[:, :, :n_top], mid, out_bot], axis=2)
    pad_w = d2 // 2 + 1 - m2
    out_ft = jnp.pad(out_ft, ((0, 0), (0, 0), (0, 0), (0, pad_w)))
    return jnp.fft.irfft2(out_ft, s=(d1, d2), norm="forward")


def spectral_conv_3d(
    x: Array,
    weights: Array,
    out_size: Tuple[int, int, int],
    modes: Tuple[int, int, int],
) -> Array:
    """3D spectral conv.  x: (B, Ci, X, Y, T) real -> (B, Co, d1, d2, d3).

    weights: (4, Ci, Co, m1, m2, m3) complex64 stacking the four (kx,ky)
    sign-quadrant blocks in reference order weights1..weights4
    (integral_operators.py:410-421): (+,+), (-,+), (+,-), (-,-).
    """
    d1, d2, d3 = out_size
    m1, m2, m3 = modes
    sx, sy = x.shape[-3], x.shape[-2]
    if (
        m1 > d1
        or m1 > sx
        or m2 > d2
        or m2 > sy
        or m3 > d3 // 2 + 1
        or m3 > x.shape[-1] // 2 + 1
    ):
        raise ValueError(f"modes {modes} incompatible with in {x.shape} out {out_size}")

    w_lo = jnp.concatenate([weights[0], weights[2]], axis=3)
    w_hi = jnp.concatenate([weights[1], weights[3]], axis=3)
    w = jnp.concatenate([w_lo, w_hi], axis=2)  # (Ci, Co, 2*m1, 2*m2, m3)

    if _dft_enabled():
        return _dft_conv3d(
            x, w, (d1, d2, d3), (m1, m2, m3), x.shape[-3:], x.dtype.name
        )

    x_ft = jnp.fft.rfftn(x.astype(jnp.float32), axes=(-3, -2, -1), norm="forward")

    # Gather the four corners into a (B, Ci, 2*m1, 2*m2, m3) block, laid out
    # [[(+,+), (+,-)], [(-,+), (-,-)]] so a single batched GEMM covers all.
    lo_x = jnp.concatenate(
        [x_ft[:, :, :m1, :m2, :m3], x_ft[:, :, :m1, sy - m2 :, :m3]], axis=3
    )
    hi_x = jnp.concatenate(
        [x_ft[:, :, sx - m1 :, :m2, :m3], x_ft[:, :, sx - m1 :, sy - m2 :, :m3]],
        axis=3,
    )
    corners = jnp.concatenate([lo_x, hi_x], axis=2)

    out = _complex_mode_matmul(corners, w)  # (B, Co, 2*m1, 2*m2, m3)

    b, co = out.shape[:2]
    # Re-assemble the zero-embedded output spectrum along kx then ky.  When
    # 2*m > d the reference's sequential quadrant writes overlap; the
    # negative-frequency blocks (written later, integral_operators.py:410-421)
    # win, so only the first d-m entries of each positive block survive.
    n_x = min(m1, d1 - m1)
    n_y = min(m2, d2 - m2)

    def _assemble_y(lo, hi):
        gap = _zeros_c((b, co, lo.shape[2], d2 - m2 - n_y, m3))
        return jnp.concatenate([lo[:, :, :, :n_y], gap, hi], axis=3)

    top = _assemble_y(out[:, :, :n_x, :m2], out[:, :, :n_x, m2:])
    bot = _assemble_y(out[:, :, m1:, :m2], out[:, :, m1:, m2:])
    gap_x = _zeros_c((b, co, d1 - m1 - n_x, d2, m3))
    out_ft = jnp.concatenate([top, gap_x, bot], axis=2)
    pad_t = d3 // 2 + 1 - m3
    out_ft = jnp.pad(out_ft, ((0, 0), (0, 0), (0, 0), (0, 0), (0, pad_t)))
    return jnp.fft.irfftn(out_ft, s=(d1, d2, d3), axes=(-3, -2, -1), norm="forward")


def fourier_truncate_3d(x: Array, out_size: Tuple[int, int, int]) -> Array:
    """Low-pass the spectrum as in the reference 3D pointwise op.

    Reference ``pointwise_op_3D`` (integral_operators.py:448-463) applies an
    explicit Fourier truncation with *default* (backward) norm — intentionally
    inconsistent with the forward-norm spectral conv; replicated, not "fixed".
    The reference's four overlapping quadrant writes copy ``ft`` into a zero
    buffer at identical indices, so the net effect is exactly a 0/1 mask over
    the union of the quadrant slices — implemented here as a static
    compile-time mask (handles the overlapping-slice cases bit-exactly).
    The subsequent irfftn to ``out_size`` trims/pads trailing spectrum
    entries (numpy/torch ``s=`` semantics agree).
    """
    d1, d2, d3 = out_size
    m1, m2, m3 = d1 // 2, d2 // 2, d3 // 2
    sx, sy = x.shape[-3], x.shape[-2]

    if _dft_enabled():
        from uno_tpu.ops import dft

        t_full = x.shape[-1]
        st_ = t_full // 2 + 1
        # kept bins at their ORIGINAL indices, filtered by the irfftn
        # trailing-trim to the output length (mask semantics above;
        # negative-frequency bins are NOT relocated when sx < d1 — the
        # reference's backward-norm quirk, preserved)
        kx = tuple(
            k for k in range(sx) if (k < m1 or k >= sx - m1) and k < d1
        )
        ky = tuple(
            k for k in range(sy) if (k < m2 or k >= sy - m2) and k < d2
        )
        kt = tuple(range(min(m3, st_, d3 // 2 + 1)))
        xp = dft.fwd_real(
            _dft_in(x), -1, t_full, kt, scaled=False
        )
        xp = dft.fwd_cplx(xp, -3, sx, kx, scaled=False)
        xp = dft.fwd_cplx(xp, -2, sy, ky, scaled=False)
        yp = dft.inv_cplx(xp, -3, d1, kx, scaled=True)
        yp = dft.inv_cplx(yp, -2, d2, ky, scaled=True)
        return dft.inv_real(yp, -1, d3, scaled=True)

    ft = jnp.fft.rfftn(x.astype(jnp.float32), axes=(-3, -2, -1))
    st = ft.shape[-1]

    ix = np.arange(sx)
    iy = np.arange(sy)
    it = np.arange(st)
    keep_x = (ix < m1) | (ix >= sx - m1)
    keep_y = (iy < m2) | (iy >= sy - m2)
    keep_t = it < m3
    mask = (
        keep_x[:, None, None] & keep_y[None, :, None] & keep_t[None, None, :]
    )
    ft_u = ft * jnp.asarray(mask, jnp.complex64)
    return jnp.fft.irfftn(ft_u, s=(d1, d2, d3), axes=(-3, -2, -1))
