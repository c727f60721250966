"""Channel (tensor-parallel analogue) sharding of spectral weights.

SURVEY.md §2.5 lists channel-sharded spectral-weight einsum as the TP
analogue for the wide bottleneck blocks.  Under jit, sharding the output-
channel axis of the weights over a mesh axis makes XLA partition the
per-mode contraction and all-gather the spectrum — no code changes in the
op itself.  This test pins that the sharded execution matches replicated.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from uno_tpu.ops import spectral
from uno_tpu.ops.spectral import spectral_conv_2d, spectral_weight_init
from uno_tpu.parallel import make_mesh

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


def test_tp_full_train_step_matches_replicated():
    """--tensor-parallel as a trainer knob (VERDICT r4 #10): a full jitted
    train step with ALL weights column-sharded over 'spatial' must match
    the replicated step (loss and updated params)."""
    from functools import partial

    from uno_tpu.losses import relative_lp_loss
    from uno_tpu.models import build_model
    from uno_tpu.optim import complex_adam, step_lr
    from uno_tpu.parallel import make_mesh, place_state, shard_batch, tp_spec
    from uno_tpu.train.state import TrainState, apply_updates

    mesh = make_mesh(n_data=2, n_spatial=4)
    s = 88  # large enough for UNO_9's mode counts at the half-scale blocks
    model = build_model("uno9", in_width=3, width=8, pad=1)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, s, s, 1)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((4, s, s)), jnp.float32)

    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    tx = complex_adam(step_lr(1e-3, 100, 0.5, 10), weight_decay=1e-3)

    def loss_fn(p, x, y):
        out = model.apply(p, x).reshape(y.shape[0], s, s)
        return relative_lp_loss(out, y, reduction="sum")

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state, x, y):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, x, y)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        return (
            TrainState(params=apply_updates(state.params, updates),
                       opt_state=opt_state, step=state.step + 1),
            loss,
        )

    params_host = jax.device_get(params)

    def fresh_state():
        return TrainState.create(
            jax.tree.map(jnp.asarray, params_host), tx
        )

    state_ref, loss_ref = train_step(fresh_state(), x, y)
    params_ref = jax.device_get(state_ref.params)

    # at width 8 over 4-way TP the 8-channel axes shard; out_dim=1 and
    # in-width-dependent axes replicate by the divisibility rule
    state_tp = place_state(mesh, fresh_state(), tensor_parallel=True)
    specs = {
        str(p): tp_spec(p, l, 4)
        for p, l in jax.tree_util.tree_leaves_with_path(params_host)
    }
    assert any("spatial" in str(s) for s in specs.values()), specs
    xs, ys = shard_batch(mesh, x, y)
    # run the TP step on the partial-DFT transform path — what TP executes
    # on TPU; XLA *CPU*'s fft thunk rejects the non-major layouts the
    # weight-sharded partitioning produces (RET_CHECK IsMonotonicWithDim0Major),
    # a backend limitation of the FFT fallback path, not of the placement
    spectral.set_dft_mode(True)
    # jit caches the traced jaxpr by avals only — without this the TP call
    # reuses the FFT-path jaxpr traced above and the mode flip is ignored
    jax.clear_caches()
    try:
        state_ref2, loss_ref2 = train_step(fresh_state(), x, y)
        params_ref2 = jax.device_get(state_ref2.params)
        with mesh:
            state_tp, loss_tp = train_step(state_tp, xs, ys)
        np.testing.assert_allclose(float(loss_tp), float(loss_ref2), rtol=1e-5)
        # cross-check: DFT and FFT references agree (same math)
        np.testing.assert_allclose(float(loss_ref2), float(loss_ref), rtol=1e-4)
        for (pa, pm), pr in zip(
            jax.tree_util.tree_leaves_with_path(jax.device_get(state_tp.params)),
            jax.tree.leaves(params_ref2),
        ):
            np.testing.assert_allclose(
                pm, pr, atol=1e-5, rtol=1e-4, err_msg=str(pa)
            )
    finally:
        spectral.set_dft_mode(None)
        jax.clear_caches()  # drop forced-DFT jaxprs; mode is aval-invisible


def test_channel_sharded_weights_match_replicated():
    mesh = make_mesh(n_data=4, n_spatial=2)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 16, 64, 64)), jnp.float32)
    w = spectral_weight_init(jax.random.PRNGKey(0), 16, 32, (9, 9), 2)

    spectral.set_pallas_mode(False)  # XLA path partitions dot_general
    try:
        fn = jax.jit(lambda x, w: spectral_conv_2d(x, w, (64, 64), (9, 9)))
        want = np.asarray(fn(x, w))

        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        # shard the out-channel axis of (blocks, Ci, Co, m1, m2) over 'spatial'
        ws = jax.device_put(w, NamedSharding(mesh, P(None, None, "spatial")))
        got = np.asarray(fn(xs, ws))
    finally:
        spectral.set_pallas_mode(None)
    np.testing.assert_allclose(got, want, atol=1e-5)
