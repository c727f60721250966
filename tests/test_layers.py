"""Layer-level parity: instance norm and GELU vs torch; 1D operator block."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from uno_tpu.nn import Dense, OperatorBlock, gelu
from uno_tpu.ops.norm import instance_norm
from uno_tpu.utils.summary import count_params, summarize


def test_instance_norm_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 5, 9, 11)).astype(np.float32)
    scale = rng.standard_normal(5).astype(np.float32)
    bias = rng.standard_normal(5).astype(np.float32)

    tm = torch.nn.InstanceNorm2d(5, affine=True)
    with torch.no_grad():
        tm.weight.copy_(torch.from_numpy(scale))
        tm.bias.copy_(torch.from_numpy(bias))
    want = tm(torch.from_numpy(x)).detach().numpy()
    got = instance_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_instance_norm_3d_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 3, 4, 5, 6)).astype(np.float32)
    tm = torch.nn.InstanceNorm3d(3, affine=True)
    want = tm(torch.from_numpy(x)).detach().numpy()
    got = instance_norm(jnp.asarray(x), jnp.ones(3), jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_gelu_is_exact_erf_form():
    x = np.linspace(-4, 4, 101).astype(np.float32)
    want = F.gelu(torch.from_numpy(x)).numpy()  # torch default: erf
    got = np.asarray(gelu(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-6)
    # and differs from the tanh approximation somewhere
    approx = np.asarray(jax.nn.gelu(jnp.asarray(x), approximate=True))
    assert np.abs(approx - want).max() > 1e-4


def test_dense_init_matches_torch_distribution():
    d = Dense(64)
    params = d.init(jax.random.PRNGKey(0), jnp.zeros((1, 100)))
    k = np.asarray(params["params"]["kernel"])
    bound = 1.0 / np.sqrt(100)
    assert k.min() >= -bound and k.max() <= bound
    # roughly uniform: std ~ bound/sqrt(3)
    np.testing.assert_allclose(k.std(), bound / np.sqrt(3), rtol=0.1)


def test_operator_block_1d():
    """1D block (Normalize defaults True in the reference — passed explicitly
    here) runs and resamples."""
    blk = OperatorBlock(in_codim=3, out_codim=5, modes=(6,), normalize=True)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 3, 32)), jnp.float32)
    params = blk.init(jax.random.PRNGKey(0), x, (16,))
    y = blk.apply(params, x, (16,))
    assert y.shape == (2, 5, 16)
    y2 = blk.apply(params, x, (64,))
    assert y2.shape == (2, 5, 64)


def test_summary_counts():
    from uno_tpu.models import build_model

    model = build_model("uno9", in_width=3, width=8, pad=1)
    x = jnp.zeros((1, 85, 85, 1))
    params = model.init(jax.random.PRNGKey(0), x)
    n = count_params(params)
    assert n > 1000
    text = summarize(model, x, params)
    assert "total parameters" in text
    assert f"{n:,}" in text
