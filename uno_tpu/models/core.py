"""Config-driven U-NO model core.

Instead of the reference's ~10 hand-copied model classes
(darcy_flow_uno2d.py, navier_stokes_uno2d.py, navier_stokes_uno3d.py), every
U-NO variant here is a declarative ``UNOSpec``: an ordered tuple of
``BlockSpec`` entries whose output grid is an exact rational multiple of the
padded base grid, plus lift/projection/padding/embedding choices.  One flax
module interprets the spec for both 2D and 3D families.

Grid arithmetic uses ``fractions.Fraction`` floors, which reproduces the
reference's ``D//k`` and ``int(D*1.6)``-style expressions exactly (the float
literals 1.6, 1.2, 0.8, ... all truncate to the same integers as the exact
rationals for every realizable grid size).
"""

from __future__ import annotations

from dataclasses import dataclass
from fractions import Fraction
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from uno_tpu.models.embeddings import EMBEDDINGS
from uno_tpu.nn.layers import Dense, OperatorBlock, gelu
from uno_tpu.ops.resample import resize

Array = jax.Array

LIFT = -1  # skip source: the padded lift output x_fc0


@dataclass(frozen=True)
class BlockSpec:
    channels: int                      # output co-domain dimension
    grid: Tuple[Fraction, ...]         # per-axis multiple of the padded grid
    modes: Tuple[int, ...]
    normalize: bool = False
    residual: bool = False
    skip: Optional[int] = None         # concat source after this block


@dataclass(frozen=True)
class UNOSpec:
    name: str
    ndim: int                          # spatial dims (2 or 3)
    in_width: int                      # input channels incl. grid embedding
    width: int
    lift_hidden: int
    embed: str                         # key into EMBEDDINGS
    pad: int
    pad_mode: str                      # 'darcy' | 'sym' | 'time'
    blocks: Tuple[BlockSpec, ...]
    proj_hidden: int
    proj_concat_lift: bool = False
    out_dim: int = 1
    pad_both: bool = False             # 3D time padding on both sides
    crop_mult: Fraction = Fraction(1)  # 3D: time-crop = floor(crop_mult*pad)
    darcy_base: int = 85               # darcy pad scale = ceil(S/darcy_base)
    # TPU mixed-precision policy: 'bfloat16' runs pointwise/lift/projection
    # matmuls and inter-block activations in bf16 with f32 accumulation;
    # FFTs, spectral weights, and norm statistics stay f32.
    dtype: str = "float32"
    remat_blocks: bool = False         # jax.checkpoint each operator block
    # Round padded grid sizes up to a multiple (extra zeros on the trailing
    # edge, cropped exactly).  The reference's Darcy grid pads 211 -> 247
    # (= 13*19, a terrible FFT size); pad_to=32 gives 256.  Padding is a
    # free hyperparameter of the method, so this changes the model (like any
    # pad choice) but not its contract.
    pad_to: Optional[int] = None


def _scale(d: int, f: Fraction) -> int:
    return (d * f.numerator) // f.denominator


class UNOModel(nn.Module):
    """Interpreter for a UNOSpec.  Input/output are channels-last:
    2D: (B, S1, S2, C) -> (B, S1, S2, out_dim)
    3D: (B, S1, S2, T, C) -> (B, S1, S2, T_out, out_dim)
    """

    spec: UNOSpec

    @nn.compact
    def __call__(self, x: Array) -> Array:
        spec = self.spec
        nd = spec.ndim
        assert x.ndim == nd + 2, (x.shape, spec.name)

        cdt = jnp.dtype(spec.dtype)
        grid = EMBEDDINGS[spec.embed](x.shape)
        x = jnp.concatenate([x, grid], axis=-1)
        if x.shape[-1] != spec.in_width:
            raise ValueError(
                f"{spec.name}: in_width={spec.in_width} but data+embedding "
                f"supply {x.shape[-1]} channels ({grid.shape[-1]} from "
                f"'{spec.embed}')"
            )

        h = gelu(Dense(spec.lift_hidden, dtype=cdt, name="fc")(x))
        h0 = Dense(spec.width, dtype=cdt, name="fc0")(h)
        h0 = gelu(h0)

        # channels-last -> channels-first
        v = jnp.moveaxis(h0, -1, 1)

        # --- domain padding -------------------------------------------------
        pad_cfg = [(0, 0), (0, 0)] + [(0, 0)] * nd
        if spec.pad_mode == "darcy":
            # pad right/bottom by ceil(S/85)*pad (darcy_flow_uno2d.py:106-107)
            import math

            scale = math.ceil(v.shape[-1] / spec.darcy_base)
            p = scale * spec.pad
            pad_cfg[-2] = (0, p)
            pad_cfg[-1] = (0, p)
            crop_kind = "grid2"
        elif spec.pad_mode == "sym":
            p = spec.pad
            pad_cfg[-2] = (p, p)
            pad_cfg[-1] = (p, p)
            crop_kind = "grid2"
        elif spec.pad_mode == "end":
            # one-sided right/bottom padding (UNO_Tutorial.ipynb cell 20)
            p = spec.pad
            pad_cfg[-2] = (0, p)
            pad_cfg[-1] = (0, p)
            crop_kind = "grid2"
        elif spec.pad_mode == "time":
            # int(pad * 0.1 * T) on the trailing (time) axis
            # (navier_stokes_uno3d.py:115-121)
            p = int(spec.pad * 0.1 * v.shape[-1])
            if spec.pad_both:
                pad_cfg[-1] = (p, p)
            else:
                pad_cfg[-1] = (0, p)
            crop_kind = "time"
        else:
            raise ValueError(spec.pad_mode)
        orig_sizes = v.shape[2:]
        if spec.pad_to:
            # round padded sizes up to a multiple (trailing zeros, cropped
            # away exactly below) — friendlier FFT/tile sizes on TPU
            for ax in range(-nd, 0):
                if spec.pad_mode == "time" and ax != -1:
                    continue  # 3D models never pad spatially
                lo, hi = pad_cfg[ax]
                n = v.shape[ax] + lo + hi
                extra = (-n) % spec.pad_to
                pad_cfg[ax] = (lo, hi + extra)
        if any(a or b for a, b in pad_cfg):
            v = jnp.pad(v, pad_cfg)

        base = v.shape[2:]

        # --- U-stack --------------------------------------------------------
        # Skip concats are carried as TUPLES of channel pieces on the 2D
        # path: SpectralConv/PointwiseOp contract each piece against its
        # Ci rows and sum (exactly the concatenated math by linearity), so
        # the concatenated activation is never written to HBM.  Measured
        # round 5 (Darcy S=211, same relay session A/B): f32 22.2->21.7
        # ms/step (the ~0.5 GB concat is pure bytes there), but bf16
        # 13.4->14.2 ms — the halved-byte concat is cheap while splitting
        # the per-piece DFT/resample matmuls shrinks their batch dims, so
        # fusion is dtype-gated: ON for f32 2D, OFF under bf16.
        # UNO_TPU_FUSED_SKIPS=1 / UNO_TPU_NO_FUSED_SKIPS=1 force either way.
        import os

        fuse_skips = nd == 2 and not os.environ.get("UNO_TPU_NO_FUSED_SKIPS")
        if cdt == jnp.bfloat16 and not os.environ.get("UNO_TPU_FUSED_SKIPS"):
            fuse_skips = False

        def _nch(t):
            return (
                sum(p.shape[1] for p in t) if isinstance(t, tuple)
                else t.shape[1]
            )

        outs = []
        cur = v
        block_cls = (
            nn.checkpoint(OperatorBlock, static_argnums=(2,))
            if spec.remat_blocks
            else OperatorBlock
        )
        for i, blk in enumerate(spec.blocks):
            out_size = tuple(_scale(d, g) for d, g in zip(base, blk.grid))
            cur = block_cls(
                in_codim=_nch(cur),
                out_codim=blk.channels,
                modes=blk.modes,
                normalize=blk.normalize,
                residual=blk.residual,
                dtype=cdt,
                name=f"block{i}",
            )(cur, out_size)
            if blk.skip is not None:
                src = v if blk.skip == LIFT else outs[blk.skip]
                if isinstance(src, tuple):  # a skipped block's own concat
                    src = jnp.concatenate(src, axis=1)
                if nd == 3:
                    # 3D skips are trilinear-resized to the current grid
                    # (navier_stokes_uno3d.py:132-143)
                    src = resize(
                        src, cur.shape[2:], (2, 3, 4), "linear", True, False
                    )
                cur = (cur, src) if fuse_skips else jnp.concatenate(
                    [cur, src], axis=1
                )
            outs.append(cur)

        # --- crop padding ---------------------------------------------------
        if crop_kind == "grid2":
            lo1, lo2 = pad_cfg[-2][0], pad_cfg[-1][0]
            s1, s2 = orig_sizes[-2], orig_sizes[-1]
            if isinstance(cur, tuple):
                # fused final skip: crop each piece and concatenate at the
                # CROPPED grid — one materialization where the unfused path
                # paid concat-at-padded-grid + crop copy
                cur = jnp.concatenate(
                    [p[..., lo1 : lo1 + s1, lo2 : lo2 + s2] for p in cur],
                    axis=1,
                )
            elif cur.shape[-2] != s1 or cur.shape[-1] != s2:
                cur = cur[..., lo1 : lo1 + s1, lo2 : lo2 + s2]
        else:  # time: crop floor(crop_mult * pad) per padded side
            lo, hi = pad_cfg[-1]
            c_lo = _scale(lo, spec.crop_mult)
            c_hi = _scale(hi, spec.crop_mult)
            if c_hi:
                cur = cur[..., :-c_hi]
            if c_lo:
                cur = cur[..., c_lo:]

        # --- projection -----------------------------------------------------
        # Head weights/dots/gelu/output run in f32 under EVERY policy —
        # bf16-rounded head weights floor converged quality (round-4
        # bisection, RESULTS.md) and the head is thin enough that f32
        # costs ~nothing.  Only the *input* may be bf16 (the U-stack's
        # activation dtype).  Both the fused kernel and the Dense
        # fallback below implement this contract.
        from uno_tpu.ops.pallas.mlp_head import (
            fused_head_enabled,
            fused_head_interpret,
            fused_mlp_head,
        )

        if (
            nd == 2
            and not spec.proj_concat_lift
            and cdt == jnp.bfloat16
            and fused_head_enabled()
        ):
            # Pallas fused head: fc1+gelu+fc2 in one kernel that never
            # materialises the [B, S1, S2, proj_hidden] hidden activation
            # in HBM (~550 MB/step of traffic at the Darcy S=211 headline;
            # the backward recomputes it tile-wise — see ops/pallas/
            # mlp_head.py).  Consumes the channels-first U-stack output
            # directly; same params/init as the Dense path below.
            k1, b1 = Dense(
                spec.proj_hidden, dtype=cdt, name="fc1"
            ).materialize(cur.shape[1])
            k2, b2 = Dense(
                spec.out_dim, dtype=cdt, name="fc2"
            ).materialize(spec.proj_hidden)
            out = fused_mlp_head(
                cur.astype(jnp.bfloat16), k1, b1, k2, b2,
                fused_head_interpret(),
            )
            # [B, O, S1, S2] -> [B, S1, S2, O] (free for O=1)
            return jnp.moveaxis(out, 1, -1)

        # The projection head runs in f32 under EVERY policy: bf16-rounded
        # head weights measurably floor converged quality (round-4 probes,
        # RESULTS.md — 1.7% vs 0.8% held-out at the Darcy full budget) and
        # the head is thin enough that f32 costs ~nothing.  Matches the
        # fused kernel above (bf16 input, f32 weights/gelu/output).
        y = jnp.moveaxis(cur, 1, -1)
        y = gelu(Dense(spec.proj_hidden, name="fc1")(y))
        if spec.proj_concat_lift:
            # UNO_P / UNO_S256 concat the lift activations into the projection
            # (navier_stokes_uno2d.py:124, :323)
            y = jnp.concatenate([y, h.astype(jnp.float32)], axis=-1)
        return Dense(spec.out_dim, name="fc2")(y)
