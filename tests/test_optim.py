"""Complex-aware Adam parity vs a NumPy oracle of the reference algorithm."""

import numpy as np
import jax
import jax.numpy as jnp

from uno_tpu.optim import complex_adam, step_lr


def numpy_adam_step(p, g, m, v, step, lr, b1, b2, eps, wd):
    """One step of the reference algorithm (Adam.py:27-52) in NumPy."""
    bc1 = 1 - b1**step
    bc2 = 1 - b2**step
    if wd:
        g = g + wd * p
    m = b1 * m + (1 - b1) * g
    v = b2 * v + (1 - b2) * (g * np.conj(g)).real
    denom = np.sqrt(v) / np.sqrt(bc2) + eps
    p = p - (lr / bc1) * m / denom
    return p, m, v


def _run_parity(dtype, wd):
    rng = np.random.default_rng(0)
    if np.issubdtype(dtype, np.complexfloating):
        p0 = (rng.standard_normal((4, 3)) + 1j * rng.standard_normal((4, 3))).astype(
            dtype
        )
        grads = [
            (rng.standard_normal((4, 3)) + 1j * rng.standard_normal((4, 3))).astype(
                dtype
            )
            for _ in range(5)
        ]
    else:
        p0 = rng.standard_normal((4, 3)).astype(dtype)
        grads = [rng.standard_normal((4, 3)).astype(dtype) for _ in range(5)]

    lr, b1, b2, eps = 1e-2, 0.9, 0.999, 1e-8
    opt = complex_adam(lr, b1, b2, eps, weight_decay=wd)
    params = {"w": jnp.asarray(p0)}
    state = opt.init(params)

    p_np = p0.copy()
    m_np = np.zeros_like(p0)
    v_np = np.zeros_like(p0, dtype=np.float32 if dtype != np.complex128 else np.float64)
    for i, g in enumerate(grads, start=1):
        # the oracle consumes torch-convention (descent-ready) gradients;
        # complex_adam consumes jax.grad outputs, which are their conjugates
        updates, state = opt.update({"w": jnp.asarray(np.conj(g))}, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        p_np, m_np, v_np = numpy_adam_step(
            p_np, g, m_np, v_np, i, lr, b1, b2, eps, wd
        )
        np.testing.assert_allclose(np.asarray(params["w"]), p_np, atol=1e-5)


def test_adam_real_no_wd():
    _run_parity(np.float32, 0.0)


def test_adam_real_wd():
    _run_parity(np.float32, 1e-3)


def test_adam_complex_no_wd():
    _run_parity(np.complex64, 0.0)


def test_adam_complex_wd():
    _run_parity(np.complex64, 1e-3)


def test_complex_descent_both_components():
    """Minimising |w|^2 with jax.grad-convention gradients must shrink BOTH
    the real and imaginary parts (regression: jax.grad returns the conjugate
    of the descent gradient for complex leaves)."""
    opt = complex_adam(5e-2)
    params = {"w": jnp.asarray([3.0 + 4.0j], jnp.complex64)}
    state = opt.init(params)

    def loss(p):
        return jnp.sum(jnp.abs(p["w"]) ** 2)

    for _ in range(100):
        g = jax.grad(loss)(params)
        updates, state = opt.update(g, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
    w = np.asarray(params["w"])[0]
    assert abs(w.real) < 1.0, w
    assert abs(w.imag) < 1.5, w


def test_complex_second_moment_is_shared():
    """nu must be |g|^2 (one real moment per complex weight), not per-part."""
    opt = complex_adam(1e-3)
    params = {"w": jnp.asarray([1.0 + 1.0j], jnp.complex64)}
    state = opt.init(params)
    g = {"w": jnp.asarray([3.0 + 4.0j], jnp.complex64)}
    _, state = opt.update(g, state, params)
    np.testing.assert_allclose(np.asarray(state.nu["w"]), [0.001 * 25.0], rtol=1e-5)
    assert state.nu["w"].dtype == jnp.float32


def test_step_lr_matches_torch_steplr_trajectory():
    spe = 7  # steps per epoch
    sched = step_lr(1e-3, step_size_epochs=2, gamma=0.5, steps_per_epoch=spe)
    for count in range(1, 60):
        epoch = (count - 1) // spe
        want = 1e-3 * 0.5 ** (epoch // 2)
        np.testing.assert_allclose(float(sched(jnp.asarray(count))), want, rtol=1e-6)


def test_amsgrad():
    opt = complex_adam(1e-2, amsgrad=True)
    params = {"w": jnp.ones((2,), jnp.float32)}
    state = opt.init(params)
    for g in ([10.0, 10.0], [0.1, 0.1]):
        updates, state = opt.update({"w": jnp.asarray(g, jnp.float32)}, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
    # max_nu retains the large first-step moment
    assert float(state.max_nu["w"][0]) >= float(state.nu["w"][0])
