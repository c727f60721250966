"""Pseudo-spectral 2D Navier-Stokes (vorticity form) solver, JAX-native.

Behavioral equivalent of the reference generator
(Data Generation/Navier Stocks/ns_datagen.py:15-140): stream function via
Fourier Poisson solve, velocities/gradients by spectral differentiation,
2/3-rule dealiasing, Crank-Nicolson implicit viscosity update.  The
reference uses the pre-1.8 ``torch.rfft(..., onesided=False)`` API (full
complex FFT) and won't run on modern torch; here the state lives in Fourier
space as complex64 and the whole trajectory is one ``lax.scan`` — compiles
to a single XLA program per batch, runs on TPU.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def default_forcing(s: int) -> Array:
    """0.1*(sin(2π(x+y)) + cos(2π(x+y))) on the [0,1) grid (ns_datagen.py:165-169)."""
    t = np.linspace(0, 1, s + 1)[:-1]
    xx, yy = np.meshgrid(t, t, indexing="ij")
    f = 0.1 * (np.sin(2 * math.pi * (xx + yy)) + np.cos(2 * math.pi * (xx + yy)))
    return jnp.asarray(f, jnp.float32)


@partial(jax.jit, static_argnames=("record_steps", "steps_per_record", "delta_t", "visc"))
def _solve(w0, f, visc, delta_t, record_steps, steps_per_record):
    n = w0.shape[-1]
    k_max = n // 2

    k = jnp.concatenate([jnp.arange(0, k_max), jnp.arange(-k_max, 0)]).astype(
        jnp.float32
    )
    k_y = jnp.broadcast_to(k[None, :], (n, n))
    k_x = jnp.broadcast_to(k[:, None], (n, n))
    lap = 4.0 * (math.pi**2) * (k_x**2 + k_y**2)
    lap = lap.at[0, 0].set(1.0)
    dealias = (
        (jnp.abs(k_y) <= (2.0 / 3.0) * k_max)
        & (jnp.abs(k_x) <= (2.0 / 3.0) * k_max)
    ).astype(jnp.float32)

    w_h0 = jnp.fft.fft2(w0).astype(jnp.complex64)
    f_h = jnp.fft.fft2(f).astype(jnp.complex64)

    two_pi_i = 2.0 * math.pi * 1j

    def step(w_h, _):
        psi_h = w_h / lap
        q = jnp.real(jnp.fft.ifft2(two_pi_i * k_y * psi_h))      # u = psi_y
        v = jnp.real(jnp.fft.ifft2(-two_pi_i * k_x * psi_h))     # v = -psi_x
        w_x = jnp.real(jnp.fft.ifft2(two_pi_i * k_x * w_h))
        w_y = jnp.real(jnp.fft.ifft2(two_pi_i * k_y * w_h))
        f_nl = jnp.fft.fft2(q * w_x + v * w_y).astype(jnp.complex64) * dealias
        num = (
            -delta_t * f_nl
            + delta_t * f_h
            + (1.0 - 0.5 * delta_t * visc * lap) * w_h
        )
        w_h = num / (1.0 + 0.5 * delta_t * visc * lap)
        return w_h.astype(jnp.complex64), None

    def record(w_h, _):
        w_h, _ = jax.lax.scan(step, w_h, None, length=steps_per_record)
        return w_h, jnp.real(jnp.fft.ifft2(w_h))

    _, sol = jax.lax.scan(record, w_h0, None, length=record_steps)
    # sol: (record_steps, B, n, n) -> (B, n, n, record_steps)
    return jnp.moveaxis(sol, 0, -1)


def navier_stokes_2d(
    w0: Array,
    f: Array,
    visc: float,
    T: float,
    delta_t: float = 1e-4,
    record_steps: int = 1,
) -> Tuple[Array, Array]:
    """Integrate vorticity w0 (B, N, N) to time T; returns
    (sol (B, N, N, record_steps), sol_t (record_steps,))."""
    steps = math.ceil(T / delta_t)
    steps_per_record = steps // record_steps
    sol = _solve(w0, f, float(visc), float(delta_t), record_steps, steps_per_record)
    sol_t = jnp.arange(1, record_steps + 1, dtype=jnp.float32) * (
        steps_per_record * delta_t
    )
    return sol, sol_t
