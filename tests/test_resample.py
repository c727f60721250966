"""Parity tests: resample matrices vs torch F.interpolate (CPU oracle)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from uno_tpu.ops.resample import resize, resize_matrix


def torch_mat(n_in, n_out, mode, ac, aa):
    """Extract torch's separable weight matrix via the identity trick
    (resize along W with H=1, which torch handles exactly)."""
    x = torch.eye(n_in, dtype=torch.float64).reshape(n_in, 1, 1, n_in)
    y = F.interpolate(x, size=(1, n_out), mode=mode, align_corners=ac, antialias=aa)
    return y.reshape(n_in, n_out).numpy().T


CASES = [
    (8, 4, True, True),
    (8, 4, False, True),
    (4, 8, True, True),
    (4, 8, False, True),
    (247, 123, True, True),
    (61, 123, True, True),
    (7, 5, False, False),
    (8, 4, True, False),
    (4, 8, True, False),
    (64, 48, True, True),
    (48, 64, True, True),
]


@pytest.mark.parametrize("n_in,n_out,ac,aa", CASES)
def test_linear_matrix_parity(n_in, n_out, ac, aa):
    got = resize_matrix(n_in, n_out, "linear", ac, aa)
    want = torch_mat(n_in, n_out, "bilinear", ac, aa)
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.parametrize("n_in,n_out,ac,aa", CASES)
def test_cubic_matrix_parity(n_in, n_out, ac, aa):
    got = resize_matrix(n_in, n_out, "cubic", ac, aa)
    want = torch_mat(n_in, n_out, "bicubic", ac, aa)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_identity_when_same_size():
    for kernel in ("linear", "cubic"):
        for ac in (True, False):
            for aa in (True, False):
                m = resize_matrix(16, 16, kernel, ac, aa)
                np.testing.assert_allclose(m, np.eye(16), atol=1e-6)


@pytest.mark.parametrize(
    "in_hw,out_hw", [((16, 12), (9, 7)), ((9, 7), (16, 12)), ((64, 64), (48, 48))]
)
def test_resize_2d_bicubic_aa_vs_torch(in_hw, out_hw):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 3, *in_hw)).astype(np.float32)
    want = F.interpolate(
        torch.from_numpy(x), size=out_hw, mode="bicubic",
        align_corners=True, antialias=True,
    ).numpy()
    got = resize(jnp.asarray(x), out_hw, (2, 3), "cubic", True, True)
    np.testing.assert_allclose(got, want, atol=3e-5)


@pytest.mark.parametrize(
    "in_s,out_s",
    [((8, 8, 6), (12, 12, 10)), ((12, 10, 8), (6, 5, 4))],
)
def test_resize_3d_trilinear_vs_torch(in_s, out_s):
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 3, *in_s)).astype(np.float32)
    want = F.interpolate(
        torch.from_numpy(x), size=out_s, mode="trilinear", align_corners=True
    ).numpy()
    got = resize(jnp.asarray(x), out_s, (2, 3, 4), "linear", True, False)
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_resize_2d_bilinear_ac_vs_torch():
    # data-loader path: bilinear align_corners=True, no antialias
    rng = np.random.default_rng(3)
    x = rng.standard_normal((4, 5, 256, 256)).astype(np.float32)
    want = F.interpolate(
        torch.from_numpy(x), size=(64, 64), mode="bilinear", align_corners=True
    ).numpy()
    got = resize(jnp.asarray(x), (64, 64), (2, 3), "linear", True, False)
    # dense-matmul application accumulates differently than torch's 2-tap
    # gather; 2e-4 absolute on unit-variance data is pure f32 noise.
    np.testing.assert_allclose(got, want, atol=2e-4)
