"""Pallas mode-contraction kernel: interpreter-mode parity on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uno_tpu.ops.pallas.cmul import complex_mode_matmul_pallas
from uno_tpu.ops import spectral

RNG = np.random.default_rng(0)


def _rand_c(*shape):
    return jnp.asarray(
        (RNG.standard_normal(shape) + 1j * RNG.standard_normal(shape)).astype(
            np.complex64
        )
    )


@pytest.mark.parametrize("b,ci,co,m", [(2, 3, 5, 7), (4, 8, 8, 128), (2, 4, 6, 200)])
def test_kernel_matches_einsum(b, ci, co, m):
    x = _rand_c(b, ci, m)
    w = _rand_c(ci, co, m)
    got = complex_mode_matmul_pallas(x, w, True)
    want = jnp.einsum("bim,iom->bom", x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_kernel_vjp_matches_einsum_vjp():
    x = _rand_c(2, 3, 40)
    w = _rand_c(3, 4, 40)

    def f_pallas(x, w):
        y = complex_mode_matmul_pallas(x, w, True)
        return jnp.sum(jnp.abs(y) ** 2)

    def f_ref(x, w):
        y = jnp.einsum("bim,iom->bom", x, w)
        return jnp.sum(jnp.abs(y) ** 2)

    gx_p, gw_p = jax.grad(f_pallas, argnums=(0, 1))(x, w)
    gx_r, gw_r = jax.grad(f_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r), atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r), atol=1e-3)


def test_spectral_conv_with_pallas_kernel():
    """Full spectral conv through the Pallas path (interpret) matches the
    XLA path."""
    x = jnp.asarray(RNG.standard_normal((2, 3, 16, 16)), jnp.float32)
    w = _rand_c(2, 3, 4, 5, 6).reshape(2, 3, 4, 5, 6)
    try:
        spectral.set_pallas_mode(True, interpret=True)
        got = spectral.spectral_conv_2d(x, w, (16, 16), (5, 6))
    finally:
        spectral.set_pallas_mode(None)
    want = spectral.spectral_conv_2d(x, w, (16, 16), (5, 6))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)
