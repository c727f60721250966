"""Partial-DFT matmul path (ops/dft.py): parity with the FFT path + oracle.

The DFT path is the TPU default (spectral transforms as MXU matmuls); CPU
tests force it on via set_dft_mode and check it against the same NumPy
oracle as the FFT path, including the overlapping-corner ("last write wins")
cases and gradients.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uno_tpu.ops.spectral import (
    set_dft_mode,
    spectral_conv_1d,
    spectral_conv_2d,
    spectral_conv_3d,
)
from tests.test_spectral import _rand_c, oracle_1d, oracle_2d, oracle_3d, RNG


@pytest.fixture
def dft_mode():
    set_dft_mode(True)
    yield
    set_dft_mode(None)


@pytest.mark.parametrize("n,d1,m1", [(16, 16, 8), (16, 8, 4), (8, 16, 4), (15, 9, 4)])
def test_dft_1d_matches_oracle(dft_mode, n, d1, m1):
    x = RNG.standard_normal((2, 3, n)).astype(np.float32)
    w = _rand_c(3, 5, m1)
    got = spectral_conv_1d(jnp.asarray(x), jnp.asarray(w)[None], d1, m1)
    want = oracle_1d(x, w, d1, m1)
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize(
    "hw,out,m",
    [
        ((16, 16), (16, 16), (7, 8)),
        ((16, 16), (8, 8), (3, 4)),
        ((8, 8), (16, 16), (3, 4)),
        ((17, 13), (11, 9), (4, 4)),
        ((12, 12), (24, 24), (6, 6)),
        # overlap case: 2*m1 > d1 -> torch last-write-wins semantics
        ((16, 16), (10, 10), (6, 4)),
        # overlap on the *input* rows: 2*m1 > h
        ((10, 16), (16, 16), (6, 4)),
    ],
)
def test_dft_2d_matches_oracle(dft_mode, hw, out, m):
    x = RNG.standard_normal((2, 3, *hw)).astype(np.float32)
    w1, w2 = _rand_c(3, 4, *m), _rand_c(3, 4, *m)
    w = jnp.stack([jnp.asarray(w1), jnp.asarray(w2)])
    got = spectral_conv_2d(jnp.asarray(x), w, out, m)
    want = oracle_2d(x, w1, w2, out[0], out[1], m[0], m[1])
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize(
    "shape,out,m",
    [
        ((8, 8, 8), (8, 8, 8), (3, 3, 4)),
        ((8, 8, 10), (12, 12, 6), (3, 3, 3)),
        ((12, 12, 8), (6, 6, 8), (2, 2, 3)),
        # overlap: 2*m > d on both spatial axes (T40 bottleneck shape class)
        ((12, 12, 8), (8, 8, 8), (5, 5, 3)),
    ],
)
def test_dft_3d_matches_oracle(dft_mode, shape, out, m):
    x = RNG.standard_normal((2, 2, *shape)).astype(np.float32)
    ws = [_rand_c(2, 3, *m) for _ in range(4)]
    w = jnp.stack([jnp.asarray(wi) for wi in ws])
    got = spectral_conv_3d(jnp.asarray(x), w, out, m)
    want = oracle_3d(x, ws, out, m)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_dft_gradients_match_fft_path():
    """Both value and (x, w) gradients agree between the two transforms."""
    x = jnp.asarray(RNG.standard_normal((2, 3, 16, 16)), jnp.float32)
    w = jnp.stack(
        [jnp.asarray(_rand_c(3, 4, 5, 5)), jnp.asarray(_rand_c(3, 4, 5, 5))]
    )
    tgt = jnp.asarray(RNG.standard_normal((2, 4, 12, 12)), jnp.float32)

    def loss(x, w):
        out = spectral_conv_2d(x, w, (12, 12), (5, 5))
        return jnp.sum((out - tgt) ** 2)

    set_dft_mode(False)
    v0, (gx0, gw0) = jax.value_and_grad(loss, argnums=(0, 1))(x, w)
    set_dft_mode(True)
    try:
        v1, (gx1, gw1) = jax.value_and_grad(loss, argnums=(0, 1))(x, w)
    finally:
        set_dft_mode(None)
    np.testing.assert_allclose(v0, v1, rtol=1e-5)
    np.testing.assert_allclose(gx0, gx1, atol=1e-4)
    np.testing.assert_allclose(gw0, gw1, atol=1e-4)


def test_dft_model_forward_matches_fft_path():
    """Full UNO_9 forward agrees between transform paths."""
    from uno_tpu.models import build_model

    model = build_model("uno9", in_width=3, width=8, pad=5)
    x = jnp.asarray(RNG.standard_normal((2, 85, 85, 1)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    set_dft_mode(False)
    y_fft = model.apply(params, x)
    set_dft_mode(True)
    try:
        y_dft = model.apply(params, x)
    finally:
        set_dft_mode(None)
    err = float(
        jnp.linalg.norm(y_fft - y_dft) / (jnp.linalg.norm(y_fft) + 1e-12)
    )
    assert err < 1e-5, err


@pytest.mark.parametrize(
    "shape,out",
    [
        ((8, 8, 10), (8, 8, 10)),
        ((12, 12, 10), (8, 8, 16)),   # spatial truncation + time pad
        ((8, 8, 10), (12, 12, 8)),    # spatial pad (sx < d1 quirk path)
        ((9, 7, 11), (7, 9, 9)),      # odd everything
    ],
)
def test_dft_fourier_truncate_3d_matches_fft_path(dft_mode, shape, out):
    from uno_tpu.ops.spectral import fourier_truncate_3d, set_dft_mode

    x = jnp.asarray(RNG.standard_normal((2, 3, *shape)), jnp.float32)
    set_dft_mode(False)
    want = np.asarray(fourier_truncate_3d(x, out))
    set_dft_mode(True)
    got = np.asarray(fourier_truncate_3d(x, out))
    np.testing.assert_allclose(got, want, atol=2e-5)
