"""Mixed-precision (bf16) and remat policy tests."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uno_tpu.models import UNOModel, uno9
from uno_tpu.models.uno2d import uno


def _x(shape, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape), jnp.float32
    )


def test_bf16_close_to_f32():
    spec32 = uno9(in_width=3, width=8, pad=1)
    spec16 = dataclasses.replace(spec32, dtype="bfloat16")
    x = _x((2, 85, 85, 1))
    m32, m16 = UNOModel(spec32), UNOModel(spec16)
    params = m32.init(jax.random.PRNGKey(0), x)
    y32 = m32.apply(params, x)
    y16 = m16.apply(params, x)  # same params: policy only changes compute
    assert y16.dtype == jnp.float32  # projection output
    rel = float(
        jnp.linalg.norm(y16.astype(jnp.float32) - y32) / jnp.linalg.norm(y32)
    )
    assert rel < 0.05, rel


def test_remat_blocks_same_output_and_grads():
    spec = uno(in_width=14, width=8, pad=0)
    spec_r = dataclasses.replace(spec, remat_blocks=True)
    x = _x((2, 64, 64, 10))
    m, mr = UNOModel(spec), UNOModel(spec_r)
    params = m.init(jax.random.PRNGKey(0), x)

    y = m.apply(params, x)
    yr = mr.apply(params, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr), atol=1e-5)

    g = jax.grad(lambda p: jnp.sum(m.apply(p, x) ** 2))(params)
    gr = jax.grad(lambda p: jnp.sum(mr.apply(p, x) ** 2))(params)
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
