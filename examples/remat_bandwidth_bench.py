"""Does rematerialisation help the HBM-bound Darcy step?

PERF.md round 3: the Darcy S=211 train step is bandwidth-bound (~18.5
GB/step f32, at the v5e HBM roofline).  Rematerialising each operator
block (`remat_blocks=True`, models/core.py:66) trades recomputed forward
FLOPs for *not storing* block activations — on a bandwidth-bound step the
recompute is free if it removes bytes.  This script measures both
policies at the bench config (f32 and bf16) on whatever backend is
active.

Usage: python examples/remat_bandwidth_bench.py [--iters 30]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench(remat: bool, dtype, iters: int) -> dict:
    import jax
    import jax.numpy as jnp

    from uno_tpu.losses import relative_lp_loss
    from uno_tpu.models import build_model
    from uno_tpu.optim import complex_adam, step_lr
    from uno_tpu.train.state import TrainState, apply_updates

    BATCH, S, WIDTH, PAD = 16, 211, 32, 12
    model = build_model(
        "uno9", in_width=3, width=WIDTH, pad=PAD, dtype=dtype,
        remat_blocks=remat,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BATCH, S, S, 1)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((BATCH, S, S)), jnp.float32)

    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    tx = complex_adam(
        step_lr(1e-3, 100, 0.5, steps_per_epoch=94), weight_decay=1e-3
    )
    state = TrainState.create(params, tx)

    def loss_fn(p, x, y):
        out = model.apply(p, x).reshape(BATCH, S, S)
        return relative_lp_loss(out, y, reduction="sum")

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state, x, y):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, x, y)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        return (
            TrainState(
                params=apply_updates(state.params, updates),
                opt_state=opt_state,
                step=state.step + 1,
            ),
            loss,
        )

    for _ in range(5):
        state, loss = train_step(state, x, y)
    assert np.isfinite(float(loss))
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss = train_step(state, x, y)
    _ = float(loss)  # d2h read: block_until_ready is a no-op on axon
    dt = (time.perf_counter() - t0) / iters
    return {
        "remat_blocks": remat,
        "dtype": str(dtype or "float32"),
        "ms_per_step": round(dt * 1000, 2),
        "samples_per_sec": round(BATCH / dt, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    for dtype in (None, "bfloat16"):
        for remat in (False, True):
            print(json.dumps(bench(remat, dtype, args.iters)))


if __name__ == "__main__":
    main()
