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
sequential TPU grid and are written once.  gelu runs in f32 inside the
kernel — one rounding *fewer* than the unfused bf16 Dense path, which is
what restores the f32-head quality the all-bf16 head lost (RESULTS.md
round-4 probe table).

Layout: the spatial grid is flattened to the 128-lane axis — blocks are
[C, LBLK] slices of channels-first [B, C, S1*S2], so every dot in the
kernel is a plain 2D ``tpu.matmul`` (Mosaic has no multi-dim contraction)
and no transpose is needed at the kernel boundary.  The final partial
lane block is masked; masking x and g to zero there makes every
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


def _erf_f32(x):
    """erf to |abs err| <= 1.5e-7 (Abramowitz & Stegun 7.1.26).

    Neither ``erf`` nor ``erfc`` has a Pallas TPU lowering on this jax, so
    the exact-erf gelu (CLAUDE.md invariant) is computed from this minimax
    form — its error is ~2 ulp of f32 erf, far below the bf16 activation
    quantisation around it (the interpret-mode parity tests in
    tests/test_fused_head.py compare against jax.nn.gelu exact)."""
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_f32(z):
    # exact erf form — parity with ops/layers.gelu (torch F.gelu default)
    return 0.5 * z * (1.0 + _erf_f32(z * (1.0 / jnp.sqrt(2.0))))


def _dgelu_f32(z):
    # d/dz [z * Phi(z)] = Phi(z) + z * phi(z)
    phi = jnp.exp(-0.5 * z * z) * (1.0 / jnp.sqrt(2.0 * jnp.pi))
    cdf = 0.5 * (1.0 + _erf_f32(z * (1.0 / jnp.sqrt(2.0))))
    return cdf + z * phi


def _pick_lblk(n: int, c: int, hidden: int, bwd: bool) -> int:
    """Largest lane block keeping all f32 per-lane tiles inside a VMEM
    budget.  Per-lane bytes calibrated against Mosaic's scoped-vmem
    accounting at the f32-dot default (w=128 OOM'd the old hidden-only
    estimate): forward holds the f32 x copy + z + a (~4*(C+3H) B/lane),
    backward adds dz/dz_lo/gx and a second x-sized tile
    (~4*(2C+6H) B/lane).  6 MB target leaves ~10 MB of the 16 MB scoped
    limit for compiler-inserted copies."""
    budget = 6 * 1024 * 1024
    per_lane = 4 * ((2 * c + 6 * hidden) if bwd else (c + 3 * hidden))
    lblk = max(512, min(8192, (budget // per_lane) // 128 * 128))
    if n <= lblk:
        return max(128, -(-n // 128) * 128)  # single padded block
    return lblk


def _fwd_kernel(x_ref, k1_ref, b1_ref, k2_ref, b2_ref, out_ref, *,
                f32_dots):
    x = x_ref[0]  # [C, LBLK] bf16
    k1 = k1_ref[:]  # [C, H]
    if f32_dots:
        x = x.astype(jnp.float32)
        k1 = k1.astype(jnp.float32)
    z = jax.lax.dot_general(
        k1, x, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [H, LBLK] f32
    z = z + b1_ref[:].astype(jnp.float32)
    a = _gelu_f32(z)
    k2 = k2_ref[:].astype(jnp.float32)  # [H, O]
    if not f32_dots:
        # bf16-rounded operands, f32 accumulation — same math as a bf16
        # dot.  The O axis is tiny (out_dim 1-3), so the contraction is
        # a VPU broadcast-multiply + sublane reduce per output channel
        # (Mosaic's tpu.matmul rejects these degenerate shapes).
        a = a.astype(jnp.bfloat16).astype(jnp.float32)
        k2 = k2.astype(jnp.bfloat16).astype(jnp.float32)
    o_dim = k2.shape[1]
    outs = [
        jnp.sum(a * k2[:, o:o + 1], axis=0, keepdims=True)
        for o in range(o_dim)
    ]
    out = outs[0] if o_dim == 1 else jnp.concatenate(outs, axis=0)
    out_ref[0] = out + b2_ref[:].astype(jnp.float32)


def _bwd_kernel(x_ref, g_ref, k1_ref, b1_ref, k2_ref,
                gx_ref, gk1_ref, gb1_ref, gk2_ref, gb2_ref,
                *, n, lblk, f32_dots):
    b, t = pl.program_id(0), pl.program_id(1)
    first = jnp.logical_and(b == 0, t == 0)

    @pl.when(first)
    def _init():
        gk1_ref[:] = jnp.zeros(gk1_ref.shape, gk1_ref.dtype)
        gb1_ref[:] = jnp.zeros(gb1_ref.shape, gb1_ref.dtype)
        gk2_ref[:] = jnp.zeros(gk2_ref.shape, gk2_ref.dtype)
        gb2_ref[:] = jnp.zeros(gb2_ref.shape, gb2_ref.dtype)

    # mask the garbage lanes of the final partial block (everything
    # downstream of the masked x/g is then exact, incl. the accumulators)
    valid = n - t * lblk  # > lblk except on the last block
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, lblk), 1)
    mask = lanes < valid
    x = jnp.where(mask, x_ref[0], jnp.zeros(x_ref[0].shape, x_ref.dtype))
    g = jnp.where(mask, g_ref[0], jnp.zeros(g_ref[0].shape, g_ref.dtype))

    k1 = k1_ref[:]  # [C, H]
    k2 = k2_ref[:]  # [H, O]
    lo = jnp.float32 if f32_dots else jnp.bfloat16
    if f32_dots:
        x = x.astype(jnp.float32)

    # recompute the hidden tile (never stored in HBM)
    z = jax.lax.dot_general(
        k1.astype(x.dtype), x, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[:].astype(jnp.float32)  # [H, LBLK] f32

    # dz = (k2 . g) * gelu'(z); O is tiny -> outer products on the VPU
    # (Mosaic's tpu.matmul rejects size-1 contractions)
    k2f = k2.astype(jnp.float32)
    o_dim = k2f.shape[1]
    gf = g.astype(jnp.float32)
    dz_pre = k2f[:, 0:1] * gf[0:1, :]
    for o in range(1, o_dim):
        dz_pre = dz_pre + k2f[:, o:o + 1] * gf[o:o + 1, :]
    dz = dz_pre * _dgelu_f32(z)  # [H, LBLK] f32
    dz_lo = dz.astype(lo)

    # input gradient: gx[c] = sum_h k1[c,h] dz[h]
    gx = jax.lax.dot_general(
        k1.astype(lo), dz_lo, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [C, LBLK]
    gx_ref[0] = gx.astype(gx_ref.dtype)

    # weight/bias gradients, accumulated over the sequential grid
    gk1_ref[:] += jax.lax.dot_general(
        x, dz_lo, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [C, H]
    gb1_ref[:] += jnp.sum(dz, axis=1, keepdims=True)  # [H, 1]
    # gk2[h,o] = sum_l a[h,l] g[o,l] — O tiny, VPU multiply + lane reduce
    a_f = _gelu_f32(z).astype(lo).astype(jnp.float32)
    g_f = g.astype(lo).astype(jnp.float32)
    cols = [
        jnp.sum(a_f * g_f[o:o + 1, :], axis=1, keepdims=True)
        for o in range(o_dim)
    ]
    gk2_ref[:] += cols[0] if o_dim == 1 else jnp.concatenate(cols, axis=1)
    gb2_ref[:] += jnp.sum(gf, axis=1, keepdims=True)  # [O, 1]


def _xspec(blk_c, lblk):
    return pl.BlockSpec(
        (1, blk_c, lblk), lambda b, t: (b, 0, t),
        memory_space=pltpu.VMEM if _HAS_PLTPU else None,
    )


def _wspec(shape):
    nd = len(shape)
    return pl.BlockSpec(
        shape, (lambda b, t: (0,) * nd),
        memory_space=pltpu.VMEM if _HAS_PLTPU else None,
    )


def _force_f32_dots() -> bool:
    """f32 weights/dots are the DEFAULT (quality-verified).

    The round-4 bisection probes (RESULTS.md: P3 vs P1/P2/full700) showed
    bf16-rounded head weights floor full-budget Darcy at ~1.7% held-out
    rel-L2 where the f32-dot head reaches ~0.8% — the prediction path's
    precision caps converged quality, and the dots are thin enough that
    f32 costs nothing measurable.  ``UNO_TPU_FUSED_HEAD_BF16=1`` opts back
    into bf16 dots for experimentation; ``UNO_TPU_FUSED_HEAD_F32=1`` is
    accepted as an explicit force-on (the probe-command spelling)."""
    import os

    if os.environ.get("UNO_TPU_FUSED_HEAD_BF16"):
        return False
    return True


def _fwd_call(x, k1, b1, k2, b2, *, interpret=False):
    bsz, c, n = x.shape
    h = k1.shape[1]
    o = k2.shape[1]
    lblk = _pick_lblk(n, c, h, bwd=False)
    grid = (bsz, pl.cdiv(n, lblk))
    f32_dots = bool(interpret) or _force_f32_dots()
    kb = jnp.bfloat16 if not f32_dots else jnp.float32
    return pl.pallas_call(
        functools.partial(_fwd_kernel, f32_dots=f32_dots),
        grid=grid,
        in_specs=[
            _xspec(c, lblk),
            _wspec((c, h)), _wspec((h, 1)), _wspec((h, o)), _wspec((o, 1)),
        ],
        out_specs=_xspec(o, lblk),
        out_shape=jax.ShapeDtypeStruct((bsz, o, n), jnp.float32),
        interpret=interpret,
    )(x, k1.astype(kb), b1.astype(jnp.float32).reshape(h, 1),
      k2.astype(kb), b2.astype(jnp.float32).reshape(o, 1))


def _bwd_call(x, g, k1, b1, k2, *, interpret=False):
    bsz, c, n = x.shape
    h = k1.shape[1]
    o = k2.shape[1]
    lblk = _pick_lblk(n, c, h, bwd=True)
    grid = (bsz, pl.cdiv(n, lblk))
    f32_dots = bool(interpret) or _force_f32_dots()
    kb = jnp.bfloat16 if not f32_dots else jnp.float32
    gx, gk1, gb1, gk2, gb2 = pl.pallas_call(
        functools.partial(
            _bwd_kernel, n=n, lblk=lblk, f32_dots=f32_dots
        ),
        grid=grid,
        in_specs=[
            _xspec(c, lblk),
            _xspec(o, lblk),
            _wspec((c, h)), _wspec((h, 1)), _wspec((h, o)),
        ],
        out_specs=[
            _xspec(c, lblk),
            _wspec((c, h)), _wspec((h, 1)), _wspec((h, o)), _wspec((o, 1)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, c, n), x.dtype),
            jax.ShapeDtypeStruct((c, h), jnp.float32),
            jax.ShapeDtypeStruct((h, 1), jnp.float32),
            jax.ShapeDtypeStruct((h, o), jnp.float32),
            jax.ShapeDtypeStruct((o, 1), jnp.float32),
        ],
        interpret=interpret,
    )(x, g, k1.astype(kb), b1.astype(jnp.float32).reshape(h, 1),
      k2.astype(kb))
    return gx, gk1, gb1[:, 0], gk2, gb2[:, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _fused_mlp_head_flat(x, k1, b1, k2, b2, interpret=False):
    return _fwd_call(x, k1, b1, k2, b2, interpret=interpret)


def _fused_fwd(x, k1, b1, k2, b2, interpret):
    return (
        _fwd_call(x, k1, b1, k2, b2, interpret=interpret),
        (x, k1, b1, k2),
    )


def _fused_bwd(interpret, res, g):
    x, k1, b1, k2 = res
    gx, gk1, gb1, gk2, gb2 = _bwd_call(
        x, g.astype(jnp.float32), k1, b1, k2, interpret=interpret
    )
    return gx, gk1, gb1, gk2, gb2


_fused_mlp_head_flat.defvjp(_fused_fwd, _fused_bwd)


def fused_mlp_head(x, k1, b1, k2, b2, interpret=False):
    """``fc2(gelu(fc1(x)))`` over channels-first ``[B, C, *spatial]``.

    x is bf16 (the U-stack's mixed-precision activations); k/b are the f32
    Dense params (``kernel`` layout [in, out] as in nn/layers.Dense); the
    result is f32 ``[B, O, *spatial]``.  Matmul math matches the unfused
    Dense path — bf16 operands, f32 accumulation — and gelu + the output
    run in f32 (fewer roundings than the unfused bf16 path).  The spatial
    grid is flattened onto the kernel's lane axis (free reshape: the
    spatial dims are trailing/contiguous in this layout).
    """
    bsz, c = x.shape[:2]
    spatial = x.shape[2:]
    n = 1
    for d in spatial:
        n *= d
    out = _fused_mlp_head_flat(
        x.reshape(bsz, c, n), k1, b1, k2, b2, interpret
    )
    return out.reshape((bsz, k2.shape[1]) + spatial)


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
