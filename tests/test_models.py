"""Shape and sanity tests for every registered U-NO model family.

Grid sizes follow the reference drivers; widths are shrunk for CPU speed
(channel counts scale linearly and don't affect shape semantics).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uno_tpu.models import MODEL_REGISTRY, UNOModel, build_model


def _init_and_run(model, x):
    params = model.init(jax.random.PRNGKey(0), x)
    return model.apply(params, x), params


# (name, kwargs, input shape, expected output shape)
CASES_2D = [
    ("uno9", dict(in_width=3, width=8, pad=2), (1, 85, 85, 1), (1, 85, 85, 1)),
    ("uno11", dict(in_width=3, width=8, pad=2), (1, 85, 85, 1), (1, 85, 85, 1)),
    ("uno", dict(in_width=14, width=8, pad=0), (1, 64, 64, 10), (1, 64, 64, 1)),
    ("uno_p", dict(in_width=14, width=8, pad=2), (1, 64, 64, 10), (1, 64, 64, 1)),
    ("uno_demo", dict(in_width=3, width=4, pad=8), (1, 64, 64, 1), (1, 64, 64, 1)),
]

CASES_3D = [
    ("uno3d_t40", dict(in_width=6, width=4, pad=3), (1, 64, 64, 10, 1), (1, 64, 64, 40, 1)),
    ("uno3d_t20", dict(in_width=6, width=4, pad=2), (1, 64, 64, 10, 1), (1, 64, 64, 20, 1)),
    ("uno3d_t10", dict(in_width=6, width=4, pad=2), (1, 64, 64, 10, 1), (1, 64, 64, 10, 1)),
    ("uno3d_t9", dict(in_width=6, width=4, pad=2), (1, 64, 64, 6, 1), (1, 64, 64, 9, 1)),
]

CASES_256 = [
    ("uno_s256", dict(in_width=14, width=4, pad=0), (1, 256, 256, 10), (1, 256, 256, 1)),
    ("uno3d_t40_256", dict(in_width=6, width=2, pad=1), (1, 256, 256, 10, 1), (1, 256, 256, 40, 1)),
    ("uno3d_t20_256", dict(in_width=6, width=2, pad=2), (1, 256, 256, 10, 1), (1, 256, 256, 20, 1)),
    ("uno3d_t10_256", dict(in_width=6, width=2, pad=2), (1, 256, 256, 10, 1), (1, 256, 256, 10, 1)),
    ("uno3d_t9_256", dict(in_width=6, width=2, pad=2), (1, 256, 256, 6, 1), (1, 256, 256, 9, 1)),
]


@pytest.mark.parametrize("name,kwargs,in_shape,out_shape", CASES_2D + CASES_3D)
def test_model_shapes(name, kwargs, in_shape, out_shape):
    model = build_model(name, **kwargs)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(in_shape), jnp.float32)
    y, _ = _init_and_run(model, x)
    assert y.shape == out_shape
    assert bool(jnp.all(jnp.isfinite(y)))


@pytest.mark.slow
@pytest.mark.parametrize("name,kwargs,in_shape,out_shape", CASES_256)
def test_model_shapes_256(name, kwargs, in_shape, out_shape):
    model = build_model(name, **kwargs)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(in_shape), jnp.float32)
    y, _ = _init_and_run(model, x)
    assert y.shape == out_shape
    assert bool(jnp.all(jnp.isfinite(y)))


def test_registry_complete():
    assert set(MODEL_REGISTRY) == {
        "uno9", "uno11", "uno", "uno_p", "uno_s256", "uno_demo",
        "uno3d_t40", "uno3d_t20", "uno3d_t10", "uno3d_t9",
        "uno3d_t40_256", "uno3d_t20_256", "uno3d_t10_256", "uno3d_t9_256",
    }


def test_discretization_invariance_zero_shot_superres():
    """Same weights must run at a finer grid and agree with the coarse run
    on a band-limited input (the U-NO resolution-invariance contract)."""
    model = build_model("uno", in_width=14, width=8, pad=0)
    rng = np.random.default_rng(0)
    # band-limited input field: low-order Fourier modes only
    k = np.fft.fftfreq(64) * 64
    keep = (np.abs(k) < 6)[:, None] & (np.abs(k)[None, :] < 6)
    spec = (rng.standard_normal((10, 64, 64)) + 1j * rng.standard_normal((10, 64, 64))) * keep
    coarse = np.real(np.fft.ifft2(spec, axes=(1, 2))).astype(np.float32)
    fine = np.real(np.fft.ifft2(np.fft.fftshift(np.pad(np.fft.fftshift(spec, axes=(1,2)), ((0,0),(32,32),(32,32))), axes=(1,2)), axes=(1, 2))).astype(np.float32) * 4.0

    x64 = jnp.asarray(coarse.transpose(1, 2, 0))[None]
    x128 = jnp.asarray(fine.transpose(1, 2, 0))[None]
    params = model.init(jax.random.PRNGKey(0), x64)
    y64 = model.apply(params, x64)
    y128 = model.apply(params, x128)
    assert y128.shape == (1, 128, 128, 1)
    # outputs at shared grid points should correlate strongly
    a = np.asarray(y64)[0, :, :, 0]
    b = np.asarray(y128)[0, ::2, ::2, 0]
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    assert corr > 0.98, corr


@pytest.mark.slow
def test_darcy_s421_full_shape_train_step():
    """The darcy_s421 preset's full-shape path: UNO_11 (the model the
    reference could not run) at 421^2 with the driver width, one full
    fwd+bwd+Adam step, finite decreasing-capable loss (VERDICT #3)."""
    from uno_tpu.losses import relative_lp_loss
    from uno_tpu.optim import complex_adam
    from uno_tpu.train.state import TrainState, apply_updates

    model = build_model("uno11", in_width=3, width=32, pad=12)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 421, 421, 1)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((1, 421, 421)), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    tx = complex_adam(1e-3, weight_decay=1e-3)
    state = TrainState.create(params, tx)

    def loss_fn(p, x, y):
        out = model.apply(p, x).reshape(1, 421, 421)
        return relative_lp_loss(out, y, reduction="sum")

    @jax.jit
    def step(state, x, y):
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

    state, l0 = step(state, x, y)
    assert np.isfinite(float(l0)), l0


@pytest.mark.slow
def test_ns2d_s256_full_shape_rollout_step():
    """The ns2d_s256 preset's full-shape path: UNO_S256 at 256^2, a 2-step
    BPTT rollout train step at the driver width (VERDICT #3)."""
    from uno_tpu.optim import complex_adam
    from uno_tpu.train.ns2d import make_rollout
    from uno_tpu.train.state import TrainState, apply_updates

    model = build_model("uno_s256", in_width=14, width=32, pad=0)
    rng = np.random.default_rng(1)
    xx = jnp.asarray(rng.standard_normal((1, 256, 256, 10)), jnp.float32)
    yy = jnp.asarray(rng.standard_normal((1, 256, 256, 2)), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), xx)
    tx = complex_adam(1e-3, weight_decay=1e-5)
    state = TrainState.create(params, tx)
    rollout = make_rollout(model, 2)

    @jax.jit
    def step(state, xx, yy):
        loss, grads = jax.value_and_grad(
            lambda p: rollout(p, xx, yy)[0]
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        return (
            TrainState(
                params=apply_updates(state.params, updates),
                opt_state=opt_state,
                step=state.step + 1,
            ),
            loss,
        )

    state, l0 = step(state, xx, yy)
    assert np.isfinite(float(l0)), l0
