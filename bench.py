"""Benchmark: Darcy UNO_9 training throughput on the reference headline config.

Runs the S=211, width=32, batch=16 training step (darcy_flow_main.py:44-117)
on whatever accelerator JAX exposes and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

``vs_baseline`` compares samples/sec/chip against A100_REF_SAMPLES_PER_SEC,
an estimate of the PyTorch reference on one A100 for the same config (the
reference publishes no numbers — BASELINE.md; the BASELINE.json north star
asks for >=3x A100 samples/sec/chip, i.e. vs_baseline >= 3).
"""

import json
import time
from functools import partial

import numpy as np

# Estimated torch-reference throughput on A100 for Darcy S=211 b=16 fwd+bwd.
# Derivation (documented, not measured — no A100 here): ~45 GFLOP/step
# forward (5 spectral convs dominated by full-res rfft2/irfft2 + 1x1 convs
# at 247^2 x 32..64ch), ~3x for fwd+bwd => ~135 GFLOP/step; torch eager FFT
# + dense einsum achieves ~20-25% of A100's 19.5 TFLOP/s fp32 on this mix
# => ~30-35ms/step => ~480 samples/s.
A100_REF_SAMPLES_PER_SEC = 480.0

BATCH = 16
S = 211
WIDTH = 32
PAD = 12
WARMUP = 3
ITERS = 50  # amortizes the tunneled runtime's per-call transfer (PERF.md)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from uno_tpu.losses import relative_lp_loss
    from uno_tpu.models import build_model
    from uno_tpu.optim import complex_adam, step_lr
    from uno_tpu.train.state import TrainState, apply_updates

    model = build_model("uno9", in_width=3, width=WIDTH, pad=PAD)
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

    for _ in range(WARMUP):
        state, loss = train_step(state, x, y)
    # float() forces a real d2h read: surfaces any deferred execution error
    # (block_until_ready alone has been observed not to)
    assert np.isfinite(float(loss)), loss

    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, loss = train_step(state, x, y)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    assert np.isfinite(float(loss)), loss

    sps = BATCH * ITERS / dt
    print(
        json.dumps(
            {
                "metric": "darcy_s211_uno9_train_samples_per_sec_per_chip",
                "value": round(sps, 2),
                "unit": "samples/sec",
                "vs_baseline": round(sps / A100_REF_SAMPLES_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
