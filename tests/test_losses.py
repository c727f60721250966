"""LpLoss parity vs hand-computed values and the reference formula."""

import numpy as np
import jax.numpy as jnp

from uno_tpu.losses import relative_lp_loss


def test_relative_l2_hand_computed():
    x = jnp.asarray([[3.0, 4.0]])
    y = jnp.asarray([[0.0, 4.0]])
    # ||x-y|| = 3, ||y|| = 4 -> 0.75
    np.testing.assert_allclose(float(relative_lp_loss(x, y)), 0.75, rtol=1e-6)


def test_reductions():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((5, 7, 3)).astype(np.float32)
    y = rng.standard_normal((5, 7, 3)).astype(np.float32)
    per = (
        np.linalg.norm((x - y).reshape(5, -1), axis=1)
        / np.linalg.norm(y.reshape(5, -1), axis=1)
    )
    np.testing.assert_allclose(
        relative_lp_loss(jnp.asarray(x), jnp.asarray(y), reduction="none"),
        per,
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(relative_lp_loss(jnp.asarray(x), jnp.asarray(y), reduction="sum")),
        per.sum(),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(relative_lp_loss(jnp.asarray(x), jnp.asarray(y), reduction="mean")),
        per.mean(),
        rtol=1e-5,
    )


def test_p1():
    x = jnp.asarray([[1.0, 2.0]])
    y = jnp.asarray([[2.0, 4.0]])
    # |x-y|_1 = 3, |y|_1 = 6 -> 0.5
    np.testing.assert_allclose(
        float(relative_lp_loss(x, y, p=1)), 0.5, rtol=1e-6
    )
