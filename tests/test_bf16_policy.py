"""bf16 mixed-precision policy through the DFT spectral path.

Round 3: the packed-plane DFT transforms accept bf16 activations directly
(bf16 operands at the MXU rate, f32 accumulation, bf16 out — ops/dft.py
``_dot``), which removes the f32 entry/exit conversions that made the
round-2 bf16 policy a net loss.  Params, optimizer state and the loss stay
f32; only activations/compute are bf16.  On the session TPU this takes the
Darcy S=211 train step from 24.1 to 15.0 ms (PERF.md round 3).

These tests pin (a) dtype preservation end-to-end — a silent f32 promotion
anywhere in the chain would quietly give back the bandwidth win — and
(b) numerical sanity vs the f32 path at bf16-roundoff tolerances.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uno_tpu.models import build_model
from uno_tpu.ops.resample import resize
from uno_tpu.ops.spectral import (
    fourier_truncate_3d,
    set_dft_mode,
    spectral_conv_1d,
    spectral_conv_2d,
    spectral_conv_3d,
)

RNG = np.random.default_rng(7)


@pytest.fixture
def dft_mode():
    set_dft_mode(True)
    yield
    set_dft_mode(None)


def _rand_c(*shape):
    return (
        RNG.standard_normal(shape) + 1j * RNG.standard_normal(shape)
    ).astype(np.complex64) * 0.1


def _rel(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return np.linalg.norm(a - b) / np.linalg.norm(a)


def test_spectral_conv_1d_bf16(dft_mode):
    x = jnp.asarray(RNG.standard_normal((2, 8, 64)), jnp.float32)
    w = jnp.asarray(_rand_c(1, 8, 8, 9))
    f32 = spectral_conv_1d(x, w, 64, 9)
    bf = spectral_conv_1d(x.astype(jnp.bfloat16), w, 64, 9)
    assert bf.dtype == jnp.bfloat16
    assert _rel(f32, bf) < 2e-2


def test_spectral_conv_2d_bf16(dft_mode):
    x = jnp.asarray(RNG.standard_normal((2, 8, 32, 32)), jnp.float32)
    w = jnp.asarray(_rand_c(2, 8, 8, 7, 8))
    f32 = spectral_conv_2d(x, w, (24, 24), (7, 8))
    bf = spectral_conv_2d(x.astype(jnp.bfloat16), w, (24, 24), (7, 8))
    assert bf.dtype == jnp.bfloat16
    assert _rel(f32, bf) < 2e-2


def test_spectral_conv_3d_bf16(dft_mode):
    x = jnp.asarray(RNG.standard_normal((1, 4, 16, 16, 10)), jnp.float32)
    w = jnp.asarray(_rand_c(4, 4, 4, 2, 2, 3))
    f32 = spectral_conv_3d(x, w, (16, 16, 10), (2, 2, 3))
    bf = spectral_conv_3d(x.astype(jnp.bfloat16), w, (16, 16, 10), (2, 2, 3))
    assert bf.dtype == jnp.bfloat16
    assert _rel(f32, bf) < 2e-2


def test_fourier_truncate_3d_bf16(dft_mode):
    x = jnp.asarray(RNG.standard_normal((1, 4, 16, 16, 12)), jnp.float32)
    f32 = fourier_truncate_3d(x, (8, 8, 6))
    bf = fourier_truncate_3d(x.astype(jnp.bfloat16), (8, 8, 6))
    assert bf.dtype == jnp.bfloat16
    assert _rel(f32, bf) < 2e-2


def test_resize_preserves_bf16():
    x = jnp.asarray(RNG.standard_normal((2, 4, 20, 20)), jnp.bfloat16)
    y = resize(x, (10, 10), axes=(-2, -1), antialias=True)
    assert y.dtype == jnp.bfloat16


def test_uno9_model_bf16_forward_matches_f32(dft_mode):
    """Same f32 params, bf16 vs f32 compute: output within bf16 roundoff.

    Also pins that the *params* come out f32 (the policy casts at compute,
    it must not halve the master weights)."""
    m32 = build_model("uno9", in_width=3, width=8, pad=8)
    mbf = build_model("uno9", in_width=3, width=8, pad=8, dtype="bfloat16")
    x = jnp.asarray(RNG.standard_normal((2, 64, 64, 1)), jnp.float32)
    params = jax.jit(m32.init)(jax.random.PRNGKey(0), x)
    leaves = jax.tree_util.tree_leaves(params)
    assert all(
        l.dtype in (jnp.float32, jnp.complex64) for l in leaves
    ), {l.dtype for l in leaves}
    y32 = jax.jit(m32.apply)(params, x)
    ybf = jax.jit(mbf.apply)(params, x)
    # the projection head (fc1/fc2) deliberately stays f32 — outputs feed
    # the loss at full precision even under the bf16 policy
    assert ybf.dtype == jnp.float32
    assert _rel(y32, ybf) < 5e-2


def test_uno9_bf16_train_step_decreases_loss(dft_mode):
    """One bf16 grad/update step on f32 params reduces the f32-eval loss."""
    from uno_tpu.losses import relative_lp_loss
    from uno_tpu.optim import complex_adam
    from uno_tpu.train.state import TrainState, apply_updates

    model = build_model("uno9", in_width=3, width=8, pad=8, dtype="bfloat16")
    x = jnp.asarray(RNG.standard_normal((2, 64, 64, 1)), jnp.float32)
    y = jnp.asarray(RNG.standard_normal((2, 64, 64)), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    tx = complex_adam(1e-3)
    state = TrainState.create(params, tx)

    def loss_fn(p):
        out = model.apply(p, x).reshape(2, 64, 64)
        return relative_lp_loss(out, y, reduction="mean")

    @jax.jit
    def step(state):
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        return TrainState(
            params=apply_updates(state.params, updates),
            opt_state=opt_state,
            step=state.step + 1,
        ), loss

    l0 = None
    for _ in range(5):
        state, loss = step(state)
        if l0 is None:
            l0 = float(loss)
    assert float(loss) < l0
    # grads must be f32 (they update f32 master params)
    leaves = jax.tree_util.tree_leaves(state.params)
    assert all(l.dtype in (jnp.float32, jnp.complex64) for l in leaves)
