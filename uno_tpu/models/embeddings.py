"""Positional (grid) embeddings concatenated on the channel axis before lift.

Reference variants:
* Darcy 2D: raw ``(x, y) ∈ [0,1]^2`` linspace grid (darcy_flow_uno2d.py:135-141)
* NS 2D: ``(sin x, sin y, cos x, cos y)`` with x,y ∈ linspace(0, 2π)
  (navier_stokes_uno2d.py:129-138)
* NS 3D: the four 2D channels plus linear time ``z ∈ [0,1]``
  (navier_stokes_uno3d.py:189-212)

torch.linspace includes both endpoints; so does jnp.linspace.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def grid_linear_2d(shape: Tuple[int, ...]) -> Array:
    """(B, S1, S2, 2) raw [0,1] coordinates."""
    b, s1, s2 = shape[0], shape[1], shape[2]
    gx = jnp.linspace(0.0, 1.0, s1, dtype=jnp.float32)
    gy = jnp.linspace(0.0, 1.0, s2, dtype=jnp.float32)
    gx = jnp.broadcast_to(gx[None, :, None, None], (b, s1, s2, 1))
    gy = jnp.broadcast_to(gy[None, None, :, None], (b, s1, s2, 1))
    return jnp.concatenate([gx, gy], axis=-1)


def grid_sincos_2d(shape: Tuple[int, ...]) -> Array:
    """(B, S1, S2, 4): sin/cos of linspace(0, 2π) per axis."""
    b, s1, s2 = shape[0], shape[1], shape[2]
    gx = jnp.linspace(0.0, 2.0 * jnp.pi, s1, dtype=jnp.float32)
    gy = jnp.linspace(0.0, 2.0 * jnp.pi, s2, dtype=jnp.float32)
    gx = jnp.broadcast_to(gx[None, :, None, None], (b, s1, s2, 1))
    gy = jnp.broadcast_to(gy[None, None, :, None], (b, s1, s2, 1))
    return jnp.concatenate(
        [jnp.sin(gx), jnp.sin(gy), jnp.cos(gx), jnp.cos(gy)], axis=-1
    )


def grid_sincos_3d(shape: Tuple[int, ...]) -> Array:
    """(B, S1, S2, T, 5): sin x, sin y, cos x, cos y, z∈[0,1]."""
    b, s1, s2, t = shape[0], shape[1], shape[2], shape[3]
    gx = jnp.linspace(0.0, 2.0 * jnp.pi, s1, dtype=jnp.float32)
    gy = jnp.linspace(0.0, 2.0 * jnp.pi, s2, dtype=jnp.float32)
    gz = jnp.linspace(0.0, 1.0, t, dtype=jnp.float32)
    gx = jnp.broadcast_to(gx[None, :, None, None, None], (b, s1, s2, t, 1))
    gy = jnp.broadcast_to(gy[None, None, :, None, None], (b, s1, s2, t, 1))
    gz = jnp.broadcast_to(gz[None, None, None, :, None], (b, s1, s2, t, 1))
    return jnp.concatenate(
        [jnp.sin(gx), jnp.sin(gy), jnp.cos(gx), jnp.cos(gy), gz], axis=-1
    )


EMBEDDINGS = {
    "linear2d": grid_linear_2d,
    "sincos2d": grid_sincos_2d,
    "sincos3d": grid_sincos_3d,
}
