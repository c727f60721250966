"""Normalisation primitives.

Instance norm matching ``torch.nn.InstanceNorm{1,2,3}d(affine=True)`` as used
by ``OperatorBlock_{1,2,3}D`` (reference ``integral_operators.py:110,270,499``):
per-(sample, channel) statistics over the spatial axes, eps=1e-5, biased
variance, no running stats (torch default ``track_running_stats=False``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def instance_norm(
    x: Array, scale: Array, bias: Array, eps: float = 1e-5
) -> Array:
    """x: (B, C, *spatial); scale/bias: (C,).  Statistics in f32."""
    spatial_axes = tuple(range(2, x.ndim))
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=spatial_axes, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=spatial_axes, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    shape = (1, -1) + (1,) * len(spatial_axes)
    out = (xf - mean) * inv * scale.reshape(shape) + bias.reshape(shape)
    return out.astype(x.dtype)
