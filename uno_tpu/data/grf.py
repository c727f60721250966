"""Gaussian random field samplers, JAX-native.

* ``GaussianRF`` — periodic GRF with spectrum
  ``σ·(4π²|k|² + τ²)^(-α/2)`` in 1/2/3 dims, sampled by scaling complex
  white noise and an inverse FFT (behavioral equivalent of the reference's
  ``random_fields-2.py:8-99``; old torch.ifft(normalized=False) == the
  standard backward-normalized inverse used here).
* ``darcy_grf`` — Neumann-boundary GRF with covariance
  ``τ^(2α-2)·(-Δ + τ²I)^(-α)`` realized by a KL expansion in the cosine
  basis (equivalent of Data Generation/darcy Flow/GRF.m, MATLAB idct2
  replaced by a precomputed orthonormal DCT-III matrix matmul — TPU-friendly
  and exact).
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _wavenumbers(size: int) -> np.ndarray:
    k_max = size // 2
    return np.concatenate([np.arange(0, k_max), np.arange(-k_max, 0)])


class GaussianRF:
    def __init__(
        self,
        dim: int,
        size: int,
        alpha: float = 2.0,
        tau: float = 3.0,
        sigma: float | None = None,
    ):
        self.dim = dim
        self.size = size
        if sigma is None:
            sigma = tau ** (0.5 * (2 * alpha - dim))
        k = _wavenumbers(size)
        if dim == 1:
            k2 = k**2
        elif dim == 2:
            k2 = k[:, None] ** 2 + k[None, :] ** 2
        elif dim == 3:
            k2 = (
                k[:, None, None] ** 2
                + k[None, :, None] ** 2
                + k[None, None, :] ** 2
            )
        else:
            raise ValueError(dim)
        sqrt_eig = (
            (size**dim)
            * math.sqrt(2.0)
            * sigma
            * (4.0 * math.pi**2 * k2 + tau**2) ** (-alpha / 2.0)
        )
        sqrt_eig.flat[0] = 0.0
        self.sqrt_eig = jnp.asarray(sqrt_eig, jnp.float32)

    def sample(self, key: jax.Array, n: int) -> Array:
        # jit: complex arithmetic must not run eagerly on some TPU runtimes
        return jax.jit(self._sample, static_argnums=1)(key, n)

    def _sample(self, key: jax.Array, n: int) -> Array:
        shape = (n,) + (self.size,) * self.dim
        kr, ki = jax.random.split(key)
        coeff = self.sqrt_eig * jax.lax.complex(
            jax.random.normal(kr, shape), jax.random.normal(ki, shape)
        )
        axes = tuple(range(1, self.dim + 1))
        return jnp.real(jnp.fft.ifftn(coeff, axes=axes))


@lru_cache(maxsize=None)
def _idct2_matrix(s: int) -> np.ndarray:
    """Orthonormal inverse DCT-II (i.e. DCT-III) synthesis matrix: matches
    MATLAB idct2 applied separably."""
    n = np.arange(s)[:, None]
    k = np.arange(s)[None, :]
    m = np.cos(np.pi * (2 * n + 1) * k / (2 * s)) * math.sqrt(2.0 / s)
    m[:, 0] = math.sqrt(1.0 / s)
    return m.astype(np.float32)


def darcy_grf(
    key: jax.Array, n: int, s: int, alpha: float = 2.0, tau: float = 3.0
) -> Array:
    """(n, s, s) samples of the Neumann GRF used for Darcy coefficients."""
    xi = jax.random.normal(key, (n, s, s))
    k1 = np.arange(s)
    k2sum = k1[:, None] ** 2 + k1[None, :] ** 2
    coef = tau ** (alpha - 1) * (np.pi**2 * k2sum + tau**2) ** (-alpha / 2)
    L = s * jnp.asarray(coef, jnp.float32) * xi
    L = L.at[:, 0, 0].set(0.0)
    m = jnp.asarray(_idct2_matrix(s))
    return jnp.einsum("ij,njk,lk->nil", m, L, m)
