"""Op-count regression guard for the DFT-matmul hot path.

Wall-clock perf tests are flaky on shared CPU runners, but the round-2/3
TPU wins are structural: the spectral transforms are a fixed small number
of dot_generals (round 2: 15 per 2D conv; round 3's packed-plane block
matrices: 5), and the whole Darcy train step traces to <100 dots.  Pinning
the traced StableHLO op counts catches any refactor that silently
reintroduces per-plane/per-matrix dispatch (PERF.md round-3) without
depending on machine speed.
"""

import re
from functools import partial

import jax
import jax.numpy as jnp
import pytest

from uno_tpu.ops.spectral import (
    set_dft_mode,
    spectral_conv_1d,
    spectral_conv_2d,
    spectral_conv_3d,
)


@pytest.fixture
def dft_mode():
    set_dft_mode(True)
    yield
    set_dft_mode(None)


def _dots(fn, *args) -> int:
    txt = jax.jit(fn).lower(*args).as_text()
    return txt.count("stablehlo.dot_general")


def test_spectral_conv_dot_counts(dft_mode):
    x1 = jnp.zeros((2, 3, 16))
    w1 = jnp.zeros((1, 3, 4, 5), jnp.complex64)
    assert _dots(lambda x, w: spectral_conv_1d(x, w, 16, 5), x1, w1) == 3

    x2 = jnp.zeros((2, 3, 16, 16))
    w2 = jnp.zeros((2, 3, 4, 5, 6), jnp.complex64)
    assert (
        _dots(lambda x, w: spectral_conv_2d(x, w, (16, 16), (5, 6)), x2, w2)
        == 5
    )

    x3 = jnp.zeros((2, 3, 8, 8, 8))
    w3 = jnp.zeros((4, 3, 4, 3, 3, 4), jnp.complex64)
    assert (
        _dots(
            lambda x, w: spectral_conv_3d(x, w, (8, 8, 8), (3, 3, 4)), x3, w3
        )
        == 7
    )


def test_darcy_train_step_op_budget(dft_mode):
    """Full UNO_9 train step (fwd + bwd + complex-Adam): traced dot and
    total-op budgets with ~15% headroom over the round-3 counts (97 dots,
    2046 ops)."""
    from uno_tpu.losses import relative_lp_loss
    from uno_tpu.models import build_model
    from uno_tpu.optim import complex_adam, step_lr
    from uno_tpu.train.state import TrainState, apply_updates

    model = build_model("uno9", in_width=3, width=8, pad=5)
    xx = jnp.zeros((2, 64, 64, 1))
    yy = jnp.zeros((2, 64, 64))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), xx)
    tx = complex_adam(
        step_lr(1e-3, 100, 0.5, steps_per_epoch=10), weight_decay=1e-3
    )
    state = TrainState.create(params, tx)

    def loss_fn(p, x, y):
        out = model.apply(p, x).reshape(y.shape)
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

    txt = train_step.lower(state, xx, yy).as_text()
    n_dots = txt.count("stablehlo.dot_general")
    n_ops = len(re.findall(r"stablehlo\.\w+", txt))
    assert n_dots <= 112, f"train step dot_general count regressed: {n_dots}"
    assert n_ops <= 2400, f"train step traced op count regressed: {n_ops}"
