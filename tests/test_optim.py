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


def test_fused_adam_matches_per_leaf_exactly():
    """fused=True is the same elementwise math on flat buffers: the update
    trajectories must agree to f32 bit-level over many steps, complex and
    real leaves, with weight decay and a schedule."""
    from uno_tpu.optim import step_lr

    rng = np.random.default_rng(3)
    params = {
        "a": jnp.asarray(rng.standard_normal((3, 4)), jnp.float32),
        "b": jnp.asarray(
            rng.standard_normal((2, 5)) + 1j * rng.standard_normal((2, 5)),
            jnp.complex64,
        ),
        "c": {"d": jnp.asarray(rng.standard_normal((7,)), jnp.float32)},
    }
    sched = step_lr(1e-3, 2, 0.5, steps_per_epoch=3)
    ref = complex_adam(sched, weight_decay=1e-3)
    fus = complex_adam(sched, weight_decay=1e-3, fused=True)
    p_ref, p_fus = params, params
    s_ref, s_fus = ref.init(p_ref), fus.init(p_fus)
    for step in range(12):
        g = jax.tree.map(
            lambda p: jnp.asarray(
                rng.standard_normal(p.shape)
                + (1j * rng.standard_normal(p.shape) if jnp.iscomplexobj(p) else 0),
                p.dtype,
            ),
            p_ref,
        )
        u_ref, s_ref = ref.update(g, s_ref, p_ref)
        u_fus, s_fus = fus.update(g, s_fus, p_fus)
        for k in jax.tree_util.tree_leaves(
            jax.tree.map(lambda a, b: np.max(np.abs(a - b)), u_ref, u_fus)
        ):
            assert float(k) == 0.0, f"step {step}: {k}"
        p_ref = jax.tree.map(lambda p, u: p + u, p_ref, u_ref)
        p_fus = jax.tree.map(lambda p, u: p + u, p_fus, u_fus)


def test_fused_adam_amsgrad_matches():
    params = {
        "w": jnp.asarray([1.0, 2.0], jnp.float32),
        "z": jnp.asarray([1 + 2j], jnp.complex64),
    }
    ref = complex_adam(1e-2, amsgrad=True)
    fus = complex_adam(1e-2, amsgrad=True, fused=True)
    s_ref, s_fus = ref.init(params), fus.init(params)
    g = {
        "w": jnp.asarray([10.0, 0.1], jnp.float32),
        "z": jnp.asarray([0.5 - 1j], jnp.complex64),
    }
    for _ in range(3):
        u_ref, s_ref = ref.update(g, s_ref, params)
        u_fus, s_fus = fus.update(g, s_fus, params)
        np.testing.assert_array_equal(np.asarray(u_ref["w"]), np.asarray(u_fus["w"]))
        np.testing.assert_array_equal(np.asarray(u_ref["z"]), np.asarray(u_fus["z"]))
