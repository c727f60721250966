"""Explicit shard_map DP: psum'd grads must equal single-device grads
(SURVEY.md §4.4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uno_tpu.losses import relative_lp_loss
from uno_tpu.models import build_model
from uno_tpu.parallel import make_mesh, replicate, shard_batch
from uno_tpu.parallel.shmap import dp_value_and_grad

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


def test_shard_map_dp_grads_match():
    model = build_model("uno", in_width=14, width=8, pad=0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 64, 64, 10)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((8, 64, 64, 1)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)

    def loss_fn(p, xb, yb):
        out = model.apply(p, xb)
        return relative_lp_loss(out, yb, reduction="sum")

    l_ref, g_ref = jax.value_and_grad(loss_fn)(params, x, y)

    mesh = make_mesh(n_data=8)
    fn = jax.jit(dp_value_and_grad(loss_fn, mesh))
    l_dp, g_dp = fn(
        replicate(mesh, params), *shard_batch(mesh, x, y)
    )
    np.testing.assert_allclose(float(l_dp), float(l_ref), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_dp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
