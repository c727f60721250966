"""Evaluation utilities: zero-shot super-resolution (BASELINE.json config 5).

U-NO's blocks size every internal grid as a ratio of the padded input grid,
so trained weights evaluate at any resolution (SURVEY.md §2.2 mechanics
note).  ``evaluate_superres`` runs a Darcy-style model trained at one grid
on inputs at another grid and reports rel-L2.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from uno_tpu.losses import relative_lp_loss


def evaluate_darcy(model, params, x: np.ndarray, y: np.ndarray, batch_size: int = 8) -> float:
    """Mean relative-L2 of model(x) vs y at whatever resolution x carries."""
    n = len(x)
    s = y.shape[1]
    fn = jax.jit(
        lambda p, xb: model.apply(p, xb).reshape(xb.shape[0], s, s)
    )
    total = 0.0
    for i in range(0, n, batch_size):
        xb = jnp.asarray(x[i : i + batch_size])
        yb = jnp.asarray(y[i : i + batch_size])
        out = fn(params, xb)
        total += float(relative_lp_loss(out, yb, reduction="sum"))
    return total / n


def evaluate_superres(
    model,
    params,
    x_lo: np.ndarray,
    y_lo: np.ndarray,
    x_hi: np.ndarray,
    y_hi: np.ndarray,
    batch_size: int = 8,
) -> Dict[str, float]:
    """Same weights at the training grid and at a finer grid."""
    return {
        "rel_l2_train_res": evaluate_darcy(model, params, x_lo, y_lo, batch_size),
        "rel_l2_super_res": evaluate_darcy(model, params, x_hi, y_hi, batch_size),
    }
