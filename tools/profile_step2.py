"""Tight device-op profile of the Darcy S=211 train step.

Unlike tools/profile_step.py (which re-enters bench_darcy inside the trace
and recompiles there, flooding the 1M-event trace buffer with host events
until device op events are dropped), this warms the EXACT step callable
first and traces only a handful of already-compiled step dispatches, with
the host/python tracers off.

Usage: python tools/profile_step2.py [--dtype bfloat16] [--steps 6]
                                     [--out /tmp/step_trace2]
"""

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--pad-to", type=int, default=None)
    ap.add_argument("--out", default="/tmp/step_trace2")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from uno_tpu.losses import relative_lp_loss
    from uno_tpu.models import build_model
    from uno_tpu.optim import complex_adam, step_lr
    from uno_tpu.train.state import TrainState, apply_updates

    BATCH, S, WIDTH, PAD = 16, 211, 32, 12
    dtype = None if args.dtype in ("", "float32", "none") else args.dtype
    model = build_model(
        "uno9", in_width=3, width=WIDTH, pad=PAD, dtype=dtype,
        pad_to=args.pad_to,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BATCH, S, S, 1)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((BATCH, S, S)), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    tx = complex_adam(step_lr(1e-3, 100, 0.5, steps_per_epoch=94),
                      weight_decay=1e-3)
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
    print("warm loss:", float(loss), file=sys.stderr)

    opts = jax.profiler.ProfileOptions()
    try:
        opts.host_tracer_level = 0
        opts.python_tracer_level = 0
    except Exception as e:  # older API: fall back to defaults
        print("profile options:", e, file=sys.stderr)
    jax.profiler.start_trace(args.out, profiler_options=opts)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, loss = train_step(state, x, y)
    lv = float(loss)  # d2h fence (block_until_ready is a relay no-op)
    dt = (time.perf_counter() - t0) / args.steps
    jax.profiler.stop_trace()
    print(f"profiled {args.steps} steps @ {dt*1000:.2f} ms/step, "
          f"loss {lv:.4f}", file=sys.stderr)


if __name__ == "__main__":
    main()
