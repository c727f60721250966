"""Golden training-dynamics parity vs the reference.

Transplants UNO_9 weights into both frameworks, runs one forward+backward on
the same batch and compares loss and ALL parameter gradients (complex
spectral-weight gradients via the conjugation between torch's and jax's
complex conventions), then checks the Adam step direction coarsely.

The post-Adam parameters are only compared loosely: the first Adam step is
sign-like (update ~ -lr*g/|g|), so fp32-noise-level gradients flip signs —
an intrinsic ill-conditioning, not a framework difference.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not mounted"
)

if os.path.isdir(REF):
    sys.path.insert(0, REF)


def test_loss_grads_and_step_match_reference():
    import torch
    from Adam import Adam as RefAdam
    from darcy_flow_uno2d import UNO_9

    from tests.test_golden_reference import _map_params, _t2n
    from uno_tpu.losses import relative_lp_loss
    from uno_tpu.models import build_model
    from uno_tpu.optim import complex_adam
    from uno_tpu.train.state import TrainState, apply_updates

    lr, wd = 1e-3, 1e-3
    s = 85
    tm = UNO_9(3, 16, pad=3)
    model = build_model("uno9", in_width=3, width=16, pad=3)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, s, s, 1)).astype(np.float32)
    y = rng.standard_normal((4, s, s)).astype(np.float32)

    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = _map_params(
        model, params, tm, ["conv0", "conv1", "conv2", "conv4", "conv5"]
    )

    # --- torch loss + grads ------------------------------------------------
    out = tm(torch.from_numpy(x)).reshape(4, s, s)
    yt = torch.from_numpy(y)
    loss_t = torch.sum(
        torch.norm(out.reshape(4, -1) - yt.reshape(4, -1), 2, 1)
        / torch.norm(yt.reshape(4, -1), 2, 1)
    )
    loss_t.backward()
    tg = {n: _t2n(p.grad) for n, p in tm.named_parameters()}

    # --- uno_tpu loss + grads ----------------------------------------------
    def loss_fn(p):
        o = model.apply(p, jnp.asarray(x)).reshape(4, s, s)
        return relative_lp_loss(o, jnp.asarray(y), reduction="sum")

    l, grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(l), float(loss_t), rtol=1e-3)

    gp = grads["params"]

    def rel(a, b):
        return np.abs(a - b).max() / (np.abs(b).max() + 1e-12)

    assert rel(np.asarray(gp["fc"]["kernel"]), tg["fc_n1.weight"].T) < 1e-4
    assert rel(np.asarray(gp["fc2"]["kernel"]), tg["fc2.weight"].T) < 1e-4
    for i, attr in enumerate(["conv0", "conv1", "conv2", "conv4", "conv5"]):
        tspec = np.stack([tg[f"{attr}.conv.weights{j + 1}"] for j in range(2)])
        jspec = np.asarray(gp[f"block{i}"]["conv"]["weights"])
        # jax.grad == conj(torch.grad) on complex leaves
        assert rel(np.conj(jspec), tspec) < 2e-4, (i, rel(np.conj(jspec), tspec))
        twk = tg[f"{attr}.w.conv.weight"][:, :, 0, 0].T
        assert rel(np.asarray(gp[f"block{i}"]["w"]["kernel"]), twk) < 1e-4

    # --- one Adam step each, coarse agreement ------------------------------
    opt = RefAdam(tm.parameters(), lr=lr, weight_decay=wd, amsgrad=False)
    opt.step()

    tx = complex_adam(lr, weight_decay=wd)
    state = TrainState.create(params, tx)
    updates, _ = tx.update(grads, state.opt_state, state.params)
    new_params = apply_updates(state.params, updates)

    ref_after = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ref_after = _map_params(
        model, ref_after, tm, ["conv0", "conv1", "conv2", "conv4", "conv5"]
    )
    flat_new = jax.tree_util.tree_flatten_with_path(new_params)[0]
    flat_ref = dict(jax.tree_util.tree_flatten_with_path(ref_after)[0])
    for path, leaf in flat_new:
        ref_leaf = np.asarray(flat_ref[tuple(path)])
        # sign-like first step: allow up to a few lr of absolute slack
        err = np.abs(np.asarray(leaf) - ref_leaf).max()
        assert err < 4 * lr, (jax.tree_util.keystr(path), err)
