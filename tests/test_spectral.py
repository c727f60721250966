"""Parity tests for the spectral conv numerics against a NumPy oracle.

The oracle transcribes the *math* of the reference SpectralConv layers
(rfft with forward norm -> corner-block complex contraction -> zero-embedded
output spectrum -> irfft forward norm) in plain NumPy, independent of the
JAX implementation's concat/pad assembly and real-matmul Karatsuba path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uno_tpu.ops.spectral import (
    fourier_truncate_3d,
    spectral_conv_1d,
    spectral_conv_2d,
    spectral_conv_3d,
    spectral_weight_init,
)

RNG = np.random.default_rng(0)


def _rand_c(*shape):
    return (RNG.standard_normal(shape) + 1j * RNG.standard_normal(shape)).astype(
        np.complex64
    )


def oracle_1d(x, w, d1, m1):
    x_ft = np.fft.rfft(x, norm="forward")
    out_ft = np.zeros((x.shape[0], w.shape[1], d1 // 2 + 1), np.complex64)
    out_ft[:, :, :m1] = np.einsum("bix,iox->box", x_ft[:, :, :m1], w)
    return np.fft.irfft(out_ft, n=d1, norm="forward")


def oracle_2d(x, w1, w2, d1, d2, m1, m2):
    x_ft = np.fft.rfft2(x, norm="forward")
    out_ft = np.zeros((x.shape[0], w1.shape[1], d1, d2 // 2 + 1), np.complex64)
    out_ft[:, :, :m1, :m2] = np.einsum("bixy,ioxy->boxy", x_ft[:, :, :m1, :m2], w1)
    out_ft[:, :, -m1:, :m2] = np.einsum("bixy,ioxy->boxy", x_ft[:, :, -m1:, :m2], w2)
    return np.fft.irfft2(out_ft, s=(d1, d2), norm="forward")


def oracle_3d(x, ws, d, m):
    d1, d2, d3 = d
    m1, m2, m3 = m
    x_ft = np.fft.rfftn(x, axes=(-3, -2, -1), norm="forward")
    out_ft = np.zeros(
        (x.shape[0], ws[0].shape[1], d1, d2, d3 // 2 + 1), np.complex64
    )
    e = lambda a, w: np.einsum("bixyz,ioxyz->boxyz", a, w)
    out_ft[:, :, :m1, :m2, :m3] = e(x_ft[:, :, :m1, :m2, :m3], ws[0])
    out_ft[:, :, -m1:, :m2, :m3] = e(x_ft[:, :, -m1:, :m2, :m3], ws[1])
    out_ft[:, :, :m1, -m2:, :m3] = e(x_ft[:, :, :m1, -m2:, :m3], ws[2])
    out_ft[:, :, -m1:, -m2:, :m3] = e(x_ft[:, :, -m1:, -m2:, :m3], ws[3])
    return np.fft.irfftn(out_ft, s=(d1, d2, d3), axes=(-3, -2, -1), norm="forward")


@pytest.mark.parametrize("n,d1,m1", [(16, 16, 8), (16, 8, 4), (8, 16, 4), (15, 9, 4)])
def test_spectral_1d_matches_oracle(n, d1, m1):
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
    ],
)
def test_spectral_2d_matches_oracle(hw, out, m):
    x = RNG.standard_normal((2, 3, *hw)).astype(np.float32)
    w1, w2 = _rand_c(3, 4, *m), _rand_c(3, 4, *m)
    w = jnp.stack([jnp.asarray(w1), jnp.asarray(w2)])
    got = spectral_conv_2d(jnp.asarray(x), w, out, m)
    want = oracle_2d(x, w1, w2, out[0], out[1], m[0], m[1])
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize(
    "s,out,m",
    [
        ((8, 8, 6), (8, 8, 6), (3, 3, 3)),
        ((8, 8, 6), (12, 12, 10), (3, 3, 3)),
        ((12, 12, 10), (6, 6, 5), (2, 2, 2)),
        # overlap case (Uno3D_T40 bottleneck): 2*m > d on both spatial axes
        ((16, 16, 20), (8, 8, 20), (6, 6, 7)),
    ],
)
def test_spectral_3d_matches_oracle(s, out, m):
    x = RNG.standard_normal((2, 2, *s)).astype(np.float32)
    ws = [_rand_c(2, 3, *m) for _ in range(4)]
    w = jnp.stack([jnp.asarray(wi) for wi in ws])
    got = spectral_conv_3d(jnp.asarray(x), w, out, m)
    want = oracle_3d(x, ws, out, m)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_resolution_invariance_trig_interp():
    """Forward-norm zero-pad in Fourier == trig interpolation: a band-limited
    signal evaluated through the layer at 2x resolution must equal the
    analytic upsampling of the low-res output."""
    n, d = 16, 32
    m1 = 5
    # band-limited input: only modes < 4
    t = np.arange(n) / n
    x = (np.sin(2 * np.pi * 2 * t) + 0.3 * np.cos(2 * np.pi * 3 * t)).astype(
        np.float32
    )[None, None]
    w = _rand_c(1, 1, m1)
    lo = np.asarray(spectral_conv_1d(jnp.asarray(x), jnp.asarray(w)[None], n, m1))
    hi = np.asarray(spectral_conv_1d(jnp.asarray(x), jnp.asarray(w)[None], d, m1))
    # hi sampled at even points == lo
    np.testing.assert_allclose(hi[..., ::2], lo, atol=1e-5)


def test_fourier_truncate_3d_matches_oracle():
    x = RNG.standard_normal((2, 3, 8, 8, 6)).astype(np.float32)
    for out in [(8, 8, 6), (4, 4, 4), (16, 16, 10), (8, 8, 12)]:
        d1, d2, d3 = out
        ft = np.fft.rfftn(x, axes=(-3, -2, -1))
        ft_u = np.zeros_like(ft)
        m1, m2, m3 = d1 // 2, d2 // 2, d3 // 2
        ft_u[:, :, :m1, :m2, :m3] = ft[:, :, :m1, :m2, :m3]
        if m1:
            ft_u[:, :, -m1:, :m2, :m3] = ft[:, :, -m1:, :m2, :m3]
        if m2:
            ft_u[:, :, :m1, -m2:, :m3] = ft[:, :, :m1, -m2:, :m3]
        if m1 and m2:
            ft_u[:, :, -m1:, -m2:, :m3] = ft[:, :, -m1:, -m2:, :m3]
        want = np.fft.irfftn(ft_u, s=out, axes=(-3, -2, -1))
        got = fourier_truncate_3d(jnp.asarray(x), out)
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_weight_init_stats():
    key = jax.random.PRNGKey(0)
    w = spectral_weight_init(key, 64, 64, (12, 12), 2)
    assert w.shape == (2, 64, 64, 12, 12)
    assert w.dtype == jnp.complex64
    scale = (1 / (2 * 64)) ** 0.5
    # complex variance ~= scale^2 (re/im each scale^2/2)
    var = np.var(np.asarray(w).real) + np.var(np.asarray(w).imag)
    np.testing.assert_allclose(var, scale**2, rtol=0.05)


# --- custom-VJP parity (round 4) -------------------------------------------
# The DFT path's backward is hand-written (ops/spectral.py _dft_conv*_bwd:
# mirrored transposed dots instead of autodiff; kills ~0.8 ms/step of
# cotangent layout copies on TPU).  These tests pin value + input-grad +
# complex-weight-grad parity against the autodiff FFT path — including the
# complex cotangent convention (JAX = conj of torch; optim.py relies on it).

from uno_tpu.ops.spectral import set_dft_mode  # noqa: E402


def _grad_parity(fn, x, w, args):
    f = lambda x, w: jnp.sum(jnp.square(fn(x, w, *args)))
    set_dft_mode(False)
    y0 = fn(x, w, *args)
    g0 = jax.grad(f, argnums=(0, 1))(x, w)
    set_dft_mode(True)
    try:
        y1 = fn(x, w, *args)
        g1 = jax.grad(f, argnums=(0, 1))(x, w)
    finally:
        set_dft_mode(None)
    rel = lambda a, b: np.linalg.norm(np.asarray(a - b)) / max(
        np.linalg.norm(np.asarray(a)), 1e-30
    )
    assert rel(y0, y1) < 5e-6
    assert rel(g0[0], g1[0]) < 5e-6
    assert rel(g0[1], g1[1]) < 5e-6


@pytest.mark.parametrize("d1,m1", [(48, 9), (24, 9)])
def test_custom_vjp_1d(d1, m1):
    x = jnp.asarray(RNG.standard_normal((2, 4, 32)), jnp.float32)
    w = jnp.asarray(0.3 * _rand_c(1, 4, 5, m1))
    _grad_parity(spectral_conv_1d, x, w, (d1, m1))


@pytest.mark.parametrize(
    "out,m", [((32, 32), (7, 8)), ((12, 16), (7, 8))]  # incl. 2*m1 > d1
)
def test_custom_vjp_2d(out, m):
    x = jnp.asarray(RNG.standard_normal((2, 4, 24, 24)), jnp.float32)
    w = jnp.asarray(0.3 * _rand_c(2, 4, 5, *m))
    _grad_parity(spectral_conv_2d, x, w, (out, m))


@pytest.mark.parametrize(
    "out,m",
    [((16, 16, 12), (5, 5, 4)), ((8, 8, 10), (5, 5, 4))],  # incl. overlap
)
def test_custom_vjp_3d(out, m):
    x = jnp.asarray(RNG.standard_normal((2, 3, 12, 12, 10)), jnp.float32)
    w = jnp.asarray(0.3 * _rand_c(4, 3, 4, *m))
    _grad_parity(spectral_conv_3d, x, w, (out, m))
