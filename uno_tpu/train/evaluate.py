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
from uno_tpu.train.common import DeviceAccumulator


def evaluate_darcy(model, params, x: np.ndarray, y: np.ndarray, batch_size: int = 8) -> float:
    """Mean relative-L2 of model(x) vs y at whatever resolution x carries."""
    n = len(x)
    s = y.shape[1]
    fn = jax.jit(
        lambda p, xb, yb: relative_lp_loss(
            model.apply(p, xb).reshape(xb.shape[0], s, s), yb, reduction="sum"
        )
    )
    total = DeviceAccumulator()
    for i in range(0, n, batch_size):
        xb = jnp.asarray(x[i : i + batch_size])
        yb = jnp.asarray(y[i : i + batch_size])
        total.add(fn(params, xb, yb))
    return total.total() / n


def evaluate_ns2d(
    model, params, a: np.ndarray, u: np.ndarray, t_f: int, batch_size: int = 8
) -> Dict[str, float]:
    """Autoregressive rollout metrics on an (a, u) split — the same per-step
    and full-trajectory rel-L2 the NS-2D trainer reports (ns_train_2d.py
    :74-110, :155-157 semantics via train.ns2d.make_rollout)."""
    from uno_tpu.train.ns2d import make_rollout

    rollout = make_rollout(model, t_f)

    @jax.jit
    def eval_step(params, xx, yy):
        loss, pred = rollout(params, xx, yy)
        traj = relative_lp_loss(pred, yy, reduction="sum")
        return loss, traj

    n = len(a)
    step_total, traj_total = DeviceAccumulator(), DeviceAccumulator()
    for i in range(0, n, batch_size):
        l, t = eval_step(
            params, jnp.asarray(a[i : i + batch_size]),
            jnp.asarray(u[i : i + batch_size]),
        )
        step_total.add(l)
        traj_total.add(t)
    return {
        "step_rel_l2": step_total.total() / n / t_f,
        "traj_rel_l2": traj_total.total() / n,
    }


def evaluate_ns3d(
    model, params, a: np.ndarray, u: np.ndarray, t_f: int, batch_size: int = 8
) -> Dict[str, float]:
    """Spatiotemporal one-shot forecast metrics: full-field rel-L2 (the
    training/selection loss, ns_train_3d.py:64-65) and mean per-timestep
    rel-L2 (the reference's logged step loss, :56-62)."""

    @jax.jit
    def eval_step(params, x, y):
        b, s = x.shape[0], x.shape[1]
        out = model.apply(params, x[..., None]).reshape(b, s, s, t_f)
        full = relative_lp_loss(out, y, reduction="sum")
        step_losses = jax.vmap(
            lambda o, t: relative_lp_loss(o, t, reduction="sum"),
            in_axes=(-1, -1),
        )(out, y)
        return full, jnp.sum(step_losses)

    n = len(a)
    full_total, step_total = DeviceAccumulator(), DeviceAccumulator()
    for i in range(0, n, batch_size):
        f, sl = eval_step(
            params, jnp.asarray(a[i : i + batch_size]),
            jnp.asarray(u[i : i + batch_size]),
        )
        full_total.add(f)
        step_total.add(sl)
    return {
        "field_rel_l2": full_total.total() / n,
        "step_rel_l2": step_total.total() / (n * t_f),
    }


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
