"""NS-3D spatiotemporal trainer.

Behavioral contract from ns_train_3d.py:15-147: one forward maps the T_in
input window to all T_f output steps at once; backward on the full-field
relative-L2; per-timestep losses logged without gradients; validation every
2 epochs; best-val selection; test reports both metrics.  (The reference's
val-loop ``S`` leak, :88, is irrelevant here — shapes are explicit.)
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from uno_tpu.data.batching import epoch_batches, num_batches
from uno_tpu.losses import relative_lp_loss
from uno_tpu.parallel.tp import place_state
from uno_tpu.train.checkpoint import CheckpointManager
from uno_tpu.train.common import (
    BestTracker,
    DataPlacer,
    DeviceAccumulator,
    GracefulStop,
    TrainConfig,
    lr_at,
    make_optimizer,
)
from uno_tpu.train.metrics import MetricLogger
from uno_tpu.train.state import TrainState, apply_updates


def train_ns3d(
    model,
    train_a: np.ndarray,   # (N, S, S, T_in)
    train_u: np.ndarray,   # (N, S, S, T_f)
    val_a: np.ndarray,
    val_u: np.ndarray,
    test_a: np.ndarray,
    test_u: np.ndarray,
    cfg: TrainConfig,
    t_f: int = 10,
    mesh=None,
    logger: Optional[MetricLogger] = None,
) -> Dict[str, Any]:
    logger = logger or MetricLogger(tensorboard_dir=cfg.log_tensorboard)
    rng = np.random.default_rng(cfg.seed)

    ntrain, nval, ntest = len(train_a), len(val_a), len(test_a)
    steps_per_epoch = num_batches(ntrain, cfg.batch_size, cfg.drop_remainder)
    tx = make_optimizer(cfg, steps_per_epoch)

    params = jax.jit(model.init)(
        jax.random.PRNGKey(cfg.seed), jnp.asarray(train_a[:1])[..., None]
    )
    state = TrainState.create(params, tx)
    if mesh is not None:
        state = place_state(mesh, state, cfg.tensor_parallel)
        assert cfg.batch_size % mesh.shape["data"] == 0, (
            cfg.batch_size, dict(mesh.shape))

    data = DataPlacer(mesh, train_a, train_u, val_a, val_u, test_a, test_u,
                      spatial=not cfg.tensor_parallel)
    drop = cfg.drop_remainder or (mesh is not None)

    def forward(params, x):
        b = x.shape[0]
        s = x.shape[1]
        if data.spatial_constraint is not None:
            # shard the leading grid axis over 'spatial' (GSPMD pads uneven
            # sizes; a device_put sharding would reject them)
            x = jax.lax.with_sharding_constraint(x, data.spatial_constraint)
        return model.apply(params, x[..., None]).reshape(b, s, s, t_f)

    def loss_fn(params, x, y):
        out = forward(params, x)
        return relative_lp_loss(out, y, reduction="sum"), out

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, x, y):
        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, x, y
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = apply_updates(state.params, updates)
        # per-step losses for logging (no_grad path in the reference)
        step_losses = jax.vmap(
            lambda o, t: relative_lp_loss(o, t, reduction="sum"),
            in_axes=(-1, -1),
        )(out, y)
        return (
            TrainState(params=params, opt_state=opt_state, step=state.step + 1),
            loss,
            jnp.sum(step_losses),
        )

    @jax.jit
    def eval_step(params, x, y):
        out = forward(params, x)
        full = relative_lp_loss(out, y, reduction="sum")
        step_losses = jax.vmap(
            lambda o, t: relative_lp_loss(o, t, reduction="sum"),
            in_axes=(-1, -1),
        )(out, y)
        return full, jnp.sum(step_losses)

    ckpt = CheckpointManager(cfg.checkpoint_dir) if cfg.checkpoint_dir else None
    best = BestTracker(ckpt)
    start_epoch = 0
    if cfg.resume and ckpt is not None and ckpt.exists("train_state"):
        restored = ckpt.restore(
            "train_state", {"state": state, "epoch": 0, "best_val": 0.0}
        )
        state = jax.tree.map(jnp.asarray, restored["state"])
        start_epoch = int(restored["epoch"]) + 1
        best.best_val = float(restored["best_val"])

    def _eval(params, ix, iy, n):
        full_total, step_total = DeviceAccumulator(), DeviceAccumulator()
        count = 0
        for xb, yb, idx in data.batches(
            ix, iy,
            epoch_batches(rng, n, cfg.batch_size, shuffle=False, drop_remainder=drop),
        ):
            f, sl = eval_step(params, xb, yb)
            full_total.add(f)
            step_total.add(sl)
            count += len(idx)
        count = max(count, 1)
        return full_total.total() / count, step_total.total() / (count * t_f)

    stopped = False
    # with-block: an exception inside the epoch loop must restore the
    # signal handlers too (VERDICT r3 weak #4; tests/test_graceful_stop.py)
    with GracefulStop() as stop:
        for epoch in range(start_epoch, cfg.epochs):
            t0 = time.perf_counter()
            acc = DeviceAccumulator()
            seen = 0
            for xb, yb, idx in data.batches(
                0, 1, epoch_batches(rng, ntrain, cfg.batch_size, drop_remainder=drop)
            ):
                state, loss, step_loss = train_step(state, xb, yb)
                acc.add(step_loss)
                seen += len(idx)
            train_step_l2 = acc.total() / (max(seen, 1) * t_f)
            dt = time.perf_counter() - t0

            record = {
                "task": "ns3d",
                "epoch": epoch,
                "step": int(state.step),
                "lr": lr_at(cfg, steps_per_epoch, int(state.step)),
                "train_step_rel_l2": train_step_l2,
                "epoch_sec": dt,
                "samples_per_sec": seen / dt,
            }
            if epoch % cfg.eval_every == 0:
                val_full, val_step = _eval(state.params, 2, 3, nval)
                record["val_step_rel_l2"] = val_step
                record["val_full_rel_l2"] = val_full
                record["saved"] = best.update(val_step, state.params)
            logger.log(record)
            if ckpt is not None and cfg.checkpoint_every and (
                epoch % cfg.checkpoint_every == 0
            ):
                ckpt.save(
                    "train_state",
                    {"state": state, "epoch": epoch, "best_val": best.best_val},
                )
            if stop.requested:
                if ckpt is not None:
                    ckpt.save(
                        "train_state",
                        {"state": state, "epoch": epoch, "best_val": best.best_val},
                    )
                logger.log({"task": "ns3d", "stopped_early_after_epoch": epoch})
                stopped = True
                break

    final_params = best.best_params if best.best_params is not None else state.params
    if ntest and not stopped:
        test_full, test_step = _eval(final_params, 4, 5, ntest)
        logger.log(
            {
                "task": "ns3d",
                "test_full_rel_l2": test_full,
                "test_step_rel_l2": test_step,
            }
        )
    else:
        test_full = test_step = float("nan")
    return {
        "params": final_params,
        "state": state,
        "best_val": best.best_val,
        "test_full_rel_l2": test_full,
        "test_step_rel_l2": test_step,
        "stopped_early": stopped,
    }
