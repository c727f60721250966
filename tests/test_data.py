"""Data pipeline tests: .mat IO round trip, loaders, GRF stats, solvers."""

import math

import numpy as np
import pytest
import scipy.io

import jax
import jax.numpy as jnp

from uno_tpu.data import (
    GaussianRF,
    MatReader,
    darcy_grf,
    default_forcing,
    epoch_batches,
    generate_darcy_batch,
    load_darcy,
    load_navier_stokes,
    navier_stokes_2d,
    solve_darcy,
)


def test_matreader_roundtrip(tmp_path):
    path = str(tmp_path / "x.mat")
    a = np.random.default_rng(0).standard_normal((3, 5, 5)).astype(np.float64)
    scipy.io.savemat(path, {"coeff": a})
    r = MatReader(path)
    got = r.read_field("coeff")
    assert got.dtype == np.float32
    np.testing.assert_allclose(got, a.astype(np.float32))


def test_load_darcy_split(tmp_path):
    path = str(tmp_path / "darcy.mat")
    n, g = 10, 21
    rng = np.random.default_rng(1)
    scipy.io.savemat(
        path,
        {"coeff": rng.standard_normal((n, g, g)), "sol": rng.standard_normal((n, g, g))},
    )
    xt, yt, xs, ys = load_darcy(2, 6, 3, path, grid_full=g)
    s = (g - 1) // 2 + 1
    assert xt.shape == (6, s, s, 1)
    assert ys.shape == (3, s, s)


def test_load_navier_stokes(tmp_path):
    path = str(tmp_path / "ns.mat")
    rng = np.random.default_rng(2)
    mdict = {}
    for i in range(3):
        mdict[f"u{i}"] = rng.standard_normal((4, 32, 32, 20)).astype(np.float32)
    scipy.io.savemat(path, mdict)
    ta, tu, sa, su = load_navier_stokes(
        path, train=8, test=4, sample_num=12, batch=4, t_in=10, t_out=10, size=16
    )
    assert ta.shape == (8, 16, 16, 10)
    assert su.shape == (4, 16, 16, 10)


def test_gaussian_rf_stats():
    grf = GaussianRF(2, 64, alpha=2.5, tau=7.0)
    u = grf.sample(jax.random.PRNGKey(0), 16)
    assert u.shape == (16, 64, 64)
    # zero mean field (k=0 mode removed)
    np.testing.assert_allclose(np.asarray(jnp.mean(u, axis=(1, 2))), 0.0, atol=1e-4)
    std = float(jnp.std(u))
    assert 0.1 < std < 10.0, std


def test_darcy_grf_neumann():
    u = darcy_grf(jax.random.PRNGKey(0), 8, 32, alpha=2.0, tau=3.0)
    assert u.shape == (8, 32, 32)
    assert bool(jnp.all(jnp.isfinite(u)))
    # Neumann GRF via cosine basis: zero normal derivative at boundaries =>
    # boundary column ~ equal to its neighbor in expectation of smoothness.
    d = np.abs(np.asarray(u[:, :, 0] - u[:, :, 1])).mean()
    i = np.abs(np.asarray(u[:, :, 15] - u[:, :, 16])).mean()
    assert d < 2 * i + 0.2


def test_ns_solver_conserves_sanity():
    """Zero initial vorticity + forcing: the solver must produce the
    analytic forced response (linear regime) at small T."""
    s = 32
    f = default_forcing(s)
    w0 = jnp.zeros((2, s, s))
    sol, sol_t = navier_stokes_2d(w0, f, visc=1e-3, T=0.01, delta_t=1e-3, record_steps=5)
    assert sol.shape == (2, s, s, 5)
    assert sol_t.shape == (5,)
    # early linear growth: w ≈ t * f
    got = np.asarray(sol[0, :, :, -1])
    want = float(sol_t[-1]) * np.asarray(f)
    np.testing.assert_allclose(got, want, atol=5e-4)


def test_ns_solver_viscous_decay():
    """Unforced flow must decay monotonically in enstrophy."""
    s = 32
    grf = GaussianRF(2, s, alpha=2.5, tau=7.0)
    w0 = grf.sample(jax.random.PRNGKey(1), 1)
    sol, _ = navier_stokes_2d(
        w0, jnp.zeros((s, s)), visc=1e-1, T=0.5, delta_t=1e-3, record_steps=5
    )
    ens = np.sum(np.asarray(sol) ** 2, axis=(1, 2))[0]
    assert np.all(np.diff(ens) < 0), ens


def test_darcy_solver_manufactured():
    """Manufactured solution: a=1, p = sin(πx)sin(πy) => f = 2π² p."""
    k = 65
    t = np.linspace(0, 1, k)
    xx, yy = np.meshgrid(t, t, indexing="ij")
    p_exact = np.sin(np.pi * xx) * np.sin(np.pi * yy)
    f = 2 * np.pi**2 * p_exact
    a = jnp.ones((k, k))
    p = solve_darcy(a, jnp.asarray(f, jnp.float32), maxiter=4000)
    err = np.abs(np.asarray(p) - p_exact).max()
    assert err < 5e-3, err


def test_generate_darcy_batch():
    a, p = generate_darcy_batch(jax.random.PRNGKey(0), 2, 33, maxiter=1500)
    assert a.shape == (2, 33, 33)
    assert p.shape == (2, 33, 33)
    assert bool(jnp.all(jnp.isfinite(p)))
    # threshold mode: coefficients in {4, 12}
    vals = np.unique(np.asarray(a))
    assert set(vals).issubset({4.0, 12.0})


def test_epoch_batches():
    rng = np.random.default_rng(0)
    batches = list(epoch_batches(rng, 10, 4))
    assert [len(b) for b in batches] == [4, 4, 2]
    assert sorted(np.concatenate(batches).tolist()) == list(range(10))


def test_load_darcy_multi(tmp_path):
    """Reference two-file pool+shuffle recipe (darcy_flow_main.py:37-93)."""
    from uno_tpu.data import load_darcy_multi

    g = 21
    rng = np.random.default_rng(2)
    paths = []
    for i in range(2):
        p = str(tmp_path / f"d{i}.mat")
        scipy.io.savemat(
            p,
            {
                "coeff": rng.standard_normal((10, g, g)),
                "sol": rng.standard_normal((10, g, g)),
            },
        )
        paths.append(p)
    tr_a, tr_u, va, vu, te_a, te_u = load_darcy_multi(
        paths, ntrain=12, nval=4, ntest=4, sub=2,
        per_file_train=8, per_file_test=2, seed=0, grid_full=g,
    )
    s = (g - 1) // 2 + 1
    assert tr_a.shape == (12, s, s, 1) and tr_u.shape == (12, s, s)
    assert va.shape == (4, s, s, 1) and te_u.shape == (4, s, s)
    # pooled coefficient/solution pairing survives the shuffle: every
    # (a, u) row must come from the same source index of the same file
    again = load_darcy_multi(
        paths, ntrain=12, nval=4, ntest=4, sub=2,
        per_file_train=8, per_file_test=2, seed=0, grid_full=g,
    )
    np.testing.assert_array_equal(tr_a, again[0])
    np.testing.assert_array_equal(te_u, again[5])
    other = load_darcy_multi(
        paths, ntrain=12, nval=4, ntest=4, sub=2,
        per_file_train=8, per_file_test=2, seed=1, grid_full=g,
    )
    assert not np.array_equal(tr_a, other[0])
