"""Pallas TPU kernel: fused projection head ``fc2(gelu(fc1(x)))``.

The reference projects every U-NO model back to physical space through a
pointwise 2-layer MLP at the FULL output grid (``uno2d.py:119-121`` /
``darcy_flow_main.py`` models: fc1 width->4*width, gelu, fc2 4*width->1).
At the Darcy S=211 headline that hidden activation is a
[16, 211, 211, 128] tensor: XLA materialises it once in the forward
(saved for backward) and re-reads it twice in the backward — ~550 MB of
HBM traffic per step for an op whose *useful* inputs and outputs are
45 MB + 3 MB (round-4 device profile: the head block is ~1.8 ms of an
11.9 ms step, all bandwidth).

This kernel never materialises the hidden layer: the forward computes
gelu(fc1) tile-by-tile in VMEM and writes only the O-channel output; the
backward (custom VJP) *recomputes* the hidden tile from x — a bandwidth-
for-FLOPs trade that is free here because the dots are thin and the step
is HBM-bound (PERF.md).  Weight gradients accumulate in VMEM across the
sequential TPU grid and are written once.

Layout: channels-first [B, C, S1, S2] (the U-stack's native activation
layout — S2 rides the 128-lane axis, C the sublanes), so no transpose is
needed at the kernel boundary.  Only the last S1 tile is masked (S1=211 is
not a multiple of the tile); masking x and g to zero there makes every
accumulated quantity exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl

try:  # pltpu imports fine off-TPU; guard for exotic builds
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def _gelu_f32(z):
    # exact erf form — parity with ops/layers.gelu (torch F.gelu default)
    return jax.nn.gelu(z, approximate=False)


def _dgelu_f32(z):
    # d/dz [z * Phi(z)] = Phi(z) + z * phi(z)
    phi = jnp.exp(-0.5 * z * z) * (1.0 / jnp.sqrt(2.0 * jnp.pi))
    cdf = 0.5 * (1.0 + jax.lax.erf(z * (1.0 / jnp.sqrt(2.0))))
    return cdf + z * phi


def _pick_slab(s1: int, s2: int, hidden: int, bwd: bool) -> int:
    """Largest S1 tile keeping the f32 hidden tiles inside a VMEM budget
    (forward holds one [H, slab, S2] f32 tile; backward holds two)."""
    budget = 6 * 1024 * 1024
    per_row = hidden * s2 * 4 * (2 if bwd else 1)
    slab = max(8, min(64, (budget // per_row) // 8 * 8))
    return min(slab, s1)


def _fwd_kernel(x_ref, k1_ref, b1_ref, k2_ref, b2_ref, out_ref, *, f32_dots):
    x = x_ref[0]  # [C, slab, S2] bf16
    k1 = k1_ref[:]  # [C, H]
    if f32_dots:
        x = x.astype(jnp.float32)
        k1 = k1.astype(jnp.float32)
    z = jax.lax.dot_general(
        k1, x, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [H, slab, S2] f32
    z = z + b1_ref[:].astype(jnp.float32)[:, :, None]
    a = _gelu_f32(z)
    k2 = k2_ref[:]  # [H, O]
    if not f32_dots:
        a = a.astype(jnp.bfloat16)
    out = jax.lax.dot_general(
        k2.astype(a.dtype), a, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [O, slab, S2] f32
    out_ref[0] = out + b2_ref[:].astype(jnp.float32)[:, :, None]


def _bwd_kernel(x_ref, g_ref, k1_ref, b1_ref, k2_ref,
                gx_ref, gk1_ref, gb1_ref, gk2_ref, gb2_ref,
                *, s1, slab, f32_dots):
    b, t = pl.program_id(0), pl.program_id(1)
    first = jnp.logical_and(b == 0, t == 0)

    @pl.when(first)
    def _init():
        gk1_ref[:] = jnp.zeros(gk1_ref.shape, gk1_ref.dtype)
        gb1_ref[:] = jnp.zeros(gb1_ref.shape, gb1_ref.dtype)
        gk2_ref[:] = jnp.zeros(gk2_ref.shape, gk2_ref.dtype)
        gb2_ref[:] = jnp.zeros(gb2_ref.shape, gb2_ref.dtype)

    # mask garbage rows of the final partial S1 tile (everything downstream
    # of the masked x/g is then exact, including the VMEM accumulators)
    valid = s1 - t * slab  # > slab except on the last tile
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, slab, 1), 1)
    mask = rows < valid
    x = jnp.where(mask, x_ref[0], jnp.zeros_like(x_ref[0]))  # [C, slab, S2]
    g = jnp.where(mask, g_ref[0], jnp.zeros_like(g_ref[0]))  # [O, slab, S2]

    k1 = k1_ref[:]  # [C, H]
    k2 = k2_ref[:]  # [H, O]
    lo = jnp.float32 if f32_dots else jnp.bfloat16
    if f32_dots:
        x = x.astype(jnp.float32)

    # recompute the hidden tile (never stored in HBM)
    z = jax.lax.dot_general(
        k1.astype(x.dtype), x, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[:].astype(jnp.float32)[:, :, None]  # [H, slab, S2] f32

    # dz = (k2 · g) * gelu'(z)
    dz = jax.lax.dot_general(
        k2.astype(jnp.float32), g, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * _dgelu_f32(z)  # [H, slab, S2] f32
    dz_lo = dz.astype(lo)

    # input gradient: gx[c] = sum_h k1[c,h] dz[h]
    gx = jax.lax.dot_general(
        k1.astype(lo), dz_lo, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    gx_ref[0] = gx.astype(gx_ref.dtype)

    # weight/bias gradients, accumulated over the sequential grid
    gk1_ref[:] += jax.lax.dot_general(
        x, dz_lo, (((1, 2), (1, 2)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [C, H]
    gb1_ref[:] += jnp.sum(dz, axis=(1, 2))[None]  # [1, H]
    a_lo = _gelu_f32(z).astype(lo)
    gk2_ref[:] += jax.lax.dot_general(
        a_lo, g.astype(lo), (((1, 2), (1, 2)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [H, O]
    gb2_ref[:] += jnp.sum(g, axis=(1, 2))[None]  # [1, O]


def _specs(bsz, blk_c, slab, s2):
    return pl.BlockSpec(
        (1, blk_c, slab, s2), lambda b, t: (b, 0, t, 0),
        memory_space=pltpu.VMEM if _HAS_PLTPU else None,
    )


def _wspec(shape):
    nd = len(shape)
    return pl.BlockSpec(
        shape, (lambda b, t: (0,) * nd),
        memory_space=pltpu.VMEM if _HAS_PLTPU else None,
    )


def _fwd_call(x, k1, b1, k2, b2, *, interpret=False):
    bsz, c, s1, s2 = x.shape
    h = k1.shape[1]
    o = k2.shape[1]
    slab = _pick_slab(s1, s2, h, bwd=False)
    grid = (bsz, pl.cdiv(s1, slab))
    f32_dots = bool(interpret)
    kb = jnp.bfloat16 if not f32_dots else jnp.float32
    return pl.pallas_call(
        functools.partial(_fwd_kernel, f32_dots=f32_dots),
        grid=grid,
        in_specs=[
            _specs(bsz, c, slab, s2),
            _wspec((c, h)), _wspec((h, 1)), _wspec((h, o)), _wspec((o, 1)),
        ],
        out_specs=_specs(bsz, o, slab, s2),
        out_shape=jax.ShapeDtypeStruct((bsz, o, s1, s2), jnp.float32),
        interpret=interpret,
    )(x, k1.astype(kb), b1.astype(jnp.float32).reshape(h, 1),
      k2.astype(kb), b2.astype(jnp.float32).reshape(o, 1))


def _bwd_call(x, g, k1, b1, k2, *, interpret=False):
    bsz, c, s1, s2 = x.shape
    h = k1.shape[1]
    o = k2.shape[1]
    slab = _pick_slab(s1, s2, h, bwd=True)
    grid = (bsz, pl.cdiv(s1, slab))
    f32_dots = bool(interpret)
    kb = jnp.bfloat16 if not f32_dots else jnp.float32
    gx, gk1, gb1, gk2, gb2 = pl.pallas_call(
        functools.partial(
            _bwd_kernel, s1=s1, slab=slab, f32_dots=f32_dots
        ),
        grid=grid,
        in_specs=[
            _specs(bsz, c, slab, s2),
            _specs(bsz, o, slab, s2),
            _wspec((c, h)), _wspec((h, 1)), _wspec((h, o)),
        ],
        out_specs=[
            _specs(bsz, c, slab, s2),
            _wspec((c, h)), _wspec((1, h)), _wspec((h, o)), _wspec((1, o)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, c, s1, s2), x.dtype),
            jax.ShapeDtypeStruct((c, h), jnp.float32),
            jax.ShapeDtypeStruct((1, h), jnp.float32),
            jax.ShapeDtypeStruct((h, o), jnp.float32),
            jax.ShapeDtypeStruct((1, o), jnp.float32),
        ],
        interpret=interpret,
    )(x, g, k1.astype(kb), b1.astype(jnp.float32).reshape(h, 1),
      k2.astype(kb))
    return gx, gk1, gb1[0], gk2, gb2[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_mlp_head(x, k1, b1, k2, b2, interpret=False):
    """``fc2(gelu(fc1(x)))`` over channels-first ``[B, C, S1, S2]``.

    x is bf16 (the U-stack's mixed-precision activations); k/b are the f32
    Dense params (``kernel`` layout [in, out] as in nn/layers.Dense); the
    result is f32 ``[B, O, S1, S2]``.  Matmul math matches the unfused
    Dense path: bf16 operands, f32 accumulation, exact-erf gelu (computed
    in f32 here — one rounding *fewer* than the unfused bf16 path).
    """
    return _fwd_call(x, k1, b1, k2, b2, interpret=interpret)


def _fused_fwd(x, k1, b1, k2, b2, interpret):
    return _fwd_call(x, k1, b1, k2, b2, interpret=interpret), (x, k1, b1, k2)


def _fused_bwd(interpret, res, g):
    x, k1, b1, k2 = res
    gx, gk1, gb1, gk2, gb2 = _bwd_call(
        x, g.astype(jnp.float32), k1, b1, k2, interpret=interpret
    )
    return gx, gk1, gb1, gk2, gb2


fused_mlp_head.defvjp(_fused_fwd, _fused_bwd)


# Policy: None = auto (TPU + bf16 only), True/False = forced.  Forcing on
# a CPU backend runs the kernel in the Pallas interpreter (tests).
_FUSED_HEAD_MODE = None


def set_fused_head_mode(enabled) -> None:
    """Force (True/False) or auto-select (None) the fused projection head."""
    global _FUSED_HEAD_MODE
    _FUSED_HEAD_MODE = enabled


def fused_head_enabled() -> bool:
    import os

    if _FUSED_HEAD_MODE is not None:
        return _FUSED_HEAD_MODE
    if os.environ.get("UNO_TPU_NO_FUSED_HEAD"):
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def fused_head_interpret() -> bool:
    try:
        return jax.default_backend() not in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return True
