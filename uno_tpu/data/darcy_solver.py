"""Darcy flow FD solver, JAX-native (replaces the reference's MATLAB).

Solves ``-∇·(a ∇p) = f`` on [0,1]² with p=0 Dirichlet boundary, second-order
five-point stencil with edge-averaged coefficients — the same discretisation
as Data Generation/darcy Flow/solve_gwf.m:4-36 (minus MATLAB's spline
re-interpolation between the cell-centred and node grids, which only matters
at the boundary ring).  The sparse direct solve is replaced by matrix-free
conjugate gradients on the stencil operator — batched, jittable, TPU-ready.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def _apply_operator(a: Array, p: Array, h2inv: float) -> Array:
    """(-∇·(a∇p)) on the interior, p has zero boundary built in.

    a, p: (..., K, K) node values; returns same shape (boundary rows zeroed).
    """
    az = jnp.pad(p, [(0, 0)] * (p.ndim - 2) + [(1, 1), (1, 1)])

    def edge(c1, c2):
        return 0.5 * (c1 + c2)

    # interior of a and p
    ac = a[..., 1:-1, 1:-1]
    an = a[..., :-2, 1:-1]
    as_ = a[..., 2:, 1:-1]
    aw = a[..., 1:-1, :-2]
    ae = a[..., 1:-1, 2:]

    pc = p[..., 1:-1, 1:-1]
    pn = p[..., :-2, 1:-1]
    ps = p[..., 2:, 1:-1]
    pw = p[..., 1:-1, :-2]
    pe = p[..., 1:-1, 2:]

    flux = (
        edge(ac, an) * (pc - pn)
        + edge(ac, as_) * (pc - ps)
        + edge(ac, aw) * (pc - pw)
        + edge(ac, ae) * (pc - pe)
    ) * h2inv
    return jnp.pad(flux, [(0, 0)] * (p.ndim - 2) + [(1, 1), (1, 1)])


@partial(jax.jit, static_argnames=("maxiter",))
def solve_darcy(
    a: Array, f: Array, tol: float = 1e-8, maxiter: int = 2000
) -> Array:
    """a, f: (..., K, K) -> p (..., K, K) with zero boundary."""
    k = a.shape[-1]
    h2inv = float((k - 1) ** 2)
    mask = jnp.zeros((k, k)).at[1:-1, 1:-1].set(1.0)
    rhs = f * mask

    def op(p):
        return _apply_operator(a, p * mask, h2inv)

    p, _ = jax.scipy.sparse.linalg.cg(op, rhs, tol=tol, maxiter=maxiter)
    return p * mask


@partial(
    jax.jit, static_argnames=("n", "s", "alpha", "tau", "coef_mode", "maxiter")
)
def generate_darcy_batch(
    key: jax.Array,
    n: int,
    s: int,
    alpha: float = 2.0,
    tau: float = 3.0,
    coef_mode: str = "threshold",
    maxiter: int = 2000,
) -> Tuple[Array, Array]:
    """Sample (coefficients, solutions) like demo.m: lognormal (exp of GRF)
    or thresholded (12 / 4) coefficients, forcing f ≡ 1.

    Fully jitted (incl. the GRF sampling) — some TPU runtimes can't execute
    eager ops reliably.
    """
    from uno_tpu.data.grf import darcy_grf

    g = darcy_grf(key, n, s, alpha, tau)
    if coef_mode == "lognormal":
        a = jnp.exp(g)
    elif coef_mode == "threshold":
        a = jnp.where(g >= 0, 12.0, 4.0)
    else:
        raise ValueError(coef_mode)
    f = jnp.ones((n, s, s), jnp.float32)
    p = solve_darcy(a, f, maxiter=maxiter)
    return a, p
