"""Relative Lp loss.

Matches the reference ``LpLoss`` (utilities3.py:75-103): per-sample flattened
relative p-norm ``||x - y||_p / ||y||_p``, reduced by mean or sum.  Trainers
use the sum reduction then divide by the dataset size
(train_darcy.py:42,76-77).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def relative_lp_loss(
    x: Array,
    y: Array,
    p: int = 2,
    reduction: str = "sum",
) -> Array:
    """x, y: (B, ...) — flattened per sample.  reduction: 'sum'|'mean'|'none'."""
    b = x.shape[0]
    xf = x.reshape(b, -1).astype(jnp.float32)
    yf = y.reshape(b, -1).astype(jnp.float32)
    if p == 2:
        diff = jnp.sqrt(jnp.sum(jnp.square(xf - yf), axis=1))
        norm = jnp.sqrt(jnp.sum(jnp.square(yf), axis=1))
    else:
        diff = jnp.sum(jnp.abs(xf - yf) ** p, axis=1) ** (1.0 / p)
        norm = jnp.sum(jnp.abs(yf) ** p, axis=1) ** (1.0 / p)
    rel = diff / norm
    if reduction == "sum":
        return jnp.sum(rel)
    if reduction == "mean":
        return jnp.mean(rel)
    return rel
