"""Distributed tests on the virtual 8-device CPU mesh.

Validates that batch-sharded data + replicated params under jit produce the
same loss/updated params as single-device training (XLA inserts the gradient
psum over the 'data' axis), plus sharding layout sanity.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from uno_tpu.losses import relative_lp_loss
from uno_tpu.models import build_model
from uno_tpu.optim import complex_adam
from uno_tpu.parallel import batch_sharding, make_mesh, replicate, shard_batch
from uno_tpu.train.state import TrainState, apply_updates

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


def _setup(mesh=None):
    model = build_model("uno", in_width=14, width=8, pad=0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 64, 64, 10)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((8, 64, 64, 1)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    tx = complex_adam(1e-3, weight_decay=1e-4)
    state = TrainState.create(params, tx)
    if mesh is not None:
        state = replicate(mesh, state)
        x, y = shard_batch(mesh, x, y)

    def loss_fn(params, x, y):
        out = model.apply(params, x)
        return relative_lp_loss(out, y, reduction="sum")

    @jax.jit
    def step(state, x, y):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, x, y)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        return (
            TrainState(
                params=apply_updates(state.params, updates),
                opt_state=opt_state,
                step=state.step + 1,
            ),
            loss,
        )

    return step, state, x, y


def test_dp_equals_single_device():
    mesh = make_mesh(n_data=8)
    step1, state1, x1, y1 = _setup(mesh=None)
    stepN, stateN, xN, yN = _setup(mesh=mesh)

    s1, l1 = step1(state1, x1, y1)
    sN, lN = stepN(stateN, xN, yN)
    np.testing.assert_allclose(float(l1), float(lN), rtol=1e-5)

    p1 = jax.tree.leaves(jax.tree.map(np.asarray, s1.params))
    pN = jax.tree.leaves(jax.tree.map(np.asarray, sN.params))
    for a, b in zip(p1, pN):
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_batch_sharding_layout():
    mesh = make_mesh(n_data=8)
    x = jnp.zeros((16, 64, 64, 10))
    xs = shard_batch(mesh, x)
    assert xs.sharding == NamedSharding(mesh, P("data"))
    # each device holds 1/8 of the batch
    shard = xs.addressable_shards[0]
    assert shard.data.shape == (2, 64, 64, 10)


def test_spatial_sharding_spectral_conv():
    """Spectral conv under batch+spatial sharding compiles and matches the
    unsharded result (XLA handles the distributed FFT transposes)."""
    from uno_tpu.ops.spectral import spectral_conv_2d, spectral_weight_init

    mesh = make_mesh(n_data=2, n_spatial=4)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 8, 64, 64)), jnp.float32)
    w = spectral_weight_init(jax.random.PRNGKey(0), 8, 8, (9, 9), 2)

    fn = jax.jit(lambda x, w: spectral_conv_2d(x, w, (64, 64), (9, 9)))
    want = np.asarray(fn(x, w))

    xs = jax.device_put(x, NamedSharding(mesh, P("data", None, "spatial")))
    ws = jax.device_put(w, NamedSharding(mesh, P()))
    got = np.asarray(fn(xs, ws))
    np.testing.assert_allclose(got, want, atol=1e-5)
