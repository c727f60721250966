"""Pallas TPU kernel: truncated-mode complex contraction for spectral convs.

The hot non-FFT op of U-NO is ``einsum('bi m, io m -> bo m')`` over complex
spectra — one tiny (B×Ci)@(Ci×Co) matmul *per Fourier mode* (reference
``integral_operators.py:178-179``).  Padded to the 128×128 MXU these tiny
GEMMs run at a few percent utilization, so this kernel instead puts the
**mode axis in the lanes** and contracts channels with broadcast
multiply-accumulates on the VPU (8×128/cycle): every lane computes its own
mode's matmul in parallel.  Complex arithmetic is the plain 4-multiply form
(mult and add cost the same on the VPU, so Karatsuba's extra adds lose).

Exposed as ``lane_contract`` (one kernel serves forward and both backward
contractions — they are the same shape with transposed/conjugated operands)
and ``complex_mode_matmul_pallas`` with a custom VJP.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl

try:  # pltpu is importable on non-TPU backends too; guard anyway
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

LANE = 128


def _contract_kernel(ur_ref, ui_ref, vr_ref, vi_ref, yr_ref, yi_ref):
    """y[a,c,l] = sum_k u[a,k,l] * v[k,c,l]   (complex, lane-parallel)."""
    k_dim = vr_ref.shape[0]
    ur = ur_ref[:]
    ui = ui_ref[:]
    acc_r = jnp.zeros(yr_ref.shape, jnp.float32)
    acc_i = jnp.zeros(yi_ref.shape, jnp.float32)
    for k in range(k_dim):
        ua = ur[:, k, :][:, None, :]
        ub = ui[:, k, :][:, None, :]
        va = vr_ref[k][None]
        vb = vi_ref[k][None]
        acc_r = acc_r + ua * va - ub * vb
        acc_i = acc_i + ua * vb + ub * va
    yr_ref[:] = acc_r
    yi_ref[:] = acc_i


def _pad_lanes(x, m):
    pad = (-m) % LANE
    if pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad)))
    return x


def _round_tile(n: int, want: int) -> int:
    """Largest divisor of n that is a multiple of 8 and <= want (or n)."""
    if want >= n:
        return n
    t = max((want // 8) * 8, 8)
    while t >= 8 and n % t:
        t -= 8
    return n if (t < 8 or n % t) else t


def _pick_tiles(a: int, k: int, c: int) -> Tuple[int, int]:
    """(A tile, C tile) keeping VMEM within budget.

    Mosaic double-buffers every blocked operand, so each block costs
    2 (buffers) x 2 (re/im) x 4 bytes per element; the f32 accumulators add
    a single-buffered copy of the output block.
    """
    budget = 10 * 1024 * 1024
    # u block 2x-buffered re+im: keep within ~half the budget
    at = _round_tile(a, (budget // 2) // max(16 * k * LANE, 1))
    fixed = 16 * at * k * LANE
    per_c = 16 * (k + at) * LANE + 8 * at * LANE
    ct = _round_tile(c, max((budget - fixed) // max(per_c, 1), 8))
    return at, ct


@functools.partial(jax.jit, static_argnames=("interpret",))
def lane_contract(ur, ui, vr, vi, interpret: bool = False):
    """(A, K, M) x (K, C, M) -> (A, C, M), complex via separate re/im planes."""
    a, k, m = ur.shape
    c = vr.shape[1]
    ur, ui = _pad_lanes(ur, m), _pad_lanes(ui, m)
    vr, vi = _pad_lanes(vr, m), _pad_lanes(vi, m)
    mp = ur.shape[-1]
    at, ct = _pick_tiles(a, k, c)
    # grid (m, a, c), c innermost: the u block stays resident across all c
    # tiles of one (m, a) while v/y stream.
    grid = (mp // LANE, a // at, c // ct)

    def idx_u(i, j, l):
        return (j, 0, i)

    def idx_v(i, j, l):
        return (0, l, i)

    def idx_y(i, j, l):
        return (j, l, i)

    specs = dict(
        in_specs=[
            pl.BlockSpec((at, k, LANE), idx_u),
            pl.BlockSpec((at, k, LANE), idx_u),
            pl.BlockSpec((k, ct, LANE), idx_v),
            pl.BlockSpec((k, ct, LANE), idx_v),
        ],
        out_specs=[
            pl.BlockSpec((at, ct, LANE), idx_y),
            pl.BlockSpec((at, ct, LANE), idx_y),
        ],
    )
    yr, yi = pl.pallas_call(
        _contract_kernel,
        out_shape=[
            jax.ShapeDtypeStruct((a, c, mp), jnp.float32),
            jax.ShapeDtypeStruct((a, c, mp), jnp.float32),
        ],
        grid=grid,
        interpret=interpret,
        **specs,
    )(ur, ui, vr, vi)
    return yr[..., :m], yi[..., :m]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def complex_mode_matmul_pallas(x, w, interpret: bool = False):
    """x: (B, Ci, M) complex64, w: (Ci, Co, M) complex64 -> (B, Co, M)."""
    yr, yi = lane_contract(
        jnp.real(x), jnp.imag(x), jnp.real(w), jnp.imag(w), interpret
    )
    return jax.lax.complex(yr, yi)


def _fwd(x, w, interpret):
    return complex_mode_matmul_pallas(x, w, interpret), (x, w)


def _bwd(interpret, res, g):
    # JAX's complex-linear VJP convention is the plain transpose (no
    # conjugation — jax.grad applies conj at the endpoints), verified against
    # jax.vjp of the reference einsum in tests.
    x, w = res
    gr, gi = jnp.real(g), jnp.imag(g)
    # dx[b,i,m] = sum_o g[b,o,m] * w[i,o,m]
    wt_r = jnp.swapaxes(jnp.real(w), 0, 1)
    wt_i = jnp.swapaxes(jnp.imag(w), 0, 1)
    dxr, dxi = lane_contract(gr, gi, wt_r, wt_i, interpret)
    # dw[i,o,m] = sum_b x[b,i,m] * g[b,o,m]
    xt_r = jnp.swapaxes(jnp.real(x), 0, 1)
    xt_i = jnp.swapaxes(jnp.imag(x), 0, 1)
    dwr, dwi = lane_contract(xt_r, xt_i, gr, gi, interpret)
    return jax.lax.complex(dxr, dxi), jax.lax.complex(dwr, dwi)


complex_mode_matmul_pallas.defvjp(_fwd, _bwd)
