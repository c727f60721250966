"""Fused skip-concat path (models/core.py tuple carrying): the 2D U-stack
carries skip concats as channel-piece tuples, and SpectralConv/PointwiseOp
contract each piece against its Ci rows of the same parameter tensors.

Math is the concatenated computation by linearity, so forward AND gradients
must match the materialized-concat path (UNO_TPU_NO_FUSED_SKIPS=1) to float
round-off; param trees must be identical (checkpoints unaffected).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uno_tpu.losses import relative_lp_loss
from uno_tpu.models import build_model


def _loss_and_grads(model, params, x, y):
    def loss_fn(p):
        out = model.apply(p, x).reshape(y.shape)
        return relative_lp_loss(out, y, reduction="sum")

    return jax.jit(jax.value_and_grad(loss_fn))(params)


@pytest.mark.parametrize("name", ["uno9", "uno11"])
def test_fused_skips_match_materialized_concat(name, monkeypatch):
    s = 88  # big enough for the 18/8(/3)-mode blocks at half/quarter grids
    model = build_model(name, in_width=3, width=8, pad=1)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, s, s, 1)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((2, s, s, 1)), jnp.float32)

    monkeypatch.delenv("UNO_TPU_NO_FUSED_SKIPS", raising=False)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    loss_f, grads_f = _loss_and_grads(model, params, x, y)

    monkeypatch.setenv("UNO_TPU_NO_FUSED_SKIPS", "1")
    params_m = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    # identical param trees (names, shapes, values) — checkpoint-compatible
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params_m)
    for (pa, a), b in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree.leaves(params_m),
    ):
        np.testing.assert_array_equal(a, b, err_msg=str(pa))
    loss_m, grads_m = _loss_and_grads(model, params_m, x, y)

    np.testing.assert_allclose(float(loss_f), float(loss_m), rtol=2e-6)
    for (pa, gf), gm in zip(
        jax.tree_util.tree_leaves_with_path(grads_f), jax.tree.leaves(grads_m)
    ):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gm), rtol=2e-4, atol=2e-6,
            err_msg=str(pa),
        )


def test_bf16_policy_defaults_to_materialized_but_force_matches(monkeypatch):
    """Under the bf16 policy fusion is gated OFF (measured slower on TPU,
    PERF.md round 5); UNO_TPU_FUSED_SKIPS=1 forces it back on and must
    still match the materialized path bit-for-bit-ish in bf16."""
    s = 88
    model = build_model("uno9", in_width=3, width=8, pad=1, dtype="bfloat16")
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, s, s, 1)), jnp.float32)

    monkeypatch.delenv("UNO_TPU_NO_FUSED_SKIPS", raising=False)
    monkeypatch.delenv("UNO_TPU_FUSED_SKIPS", raising=False)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    y_default = jax.jit(model.apply)(params, x)

    monkeypatch.setenv("UNO_TPU_NO_FUSED_SKIPS", "1")
    y_mat = jax.jit(model.apply)(params, x)
    # gate: bf16 default IS the materialized path
    np.testing.assert_array_equal(np.asarray(y_default), np.asarray(y_mat))

    monkeypatch.delenv("UNO_TPU_NO_FUSED_SKIPS", raising=False)
    monkeypatch.setenv("UNO_TPU_FUSED_SKIPS", "1")
    y_fused = jax.jit(model.apply)(params, x)
    np.testing.assert_allclose(
        np.asarray(y_fused, np.float32), np.asarray(y_mat, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_fused_skips_dft_path_matches(monkeypatch):
    """Same equality on the partial-DFT transform path (what TPU runs)."""
    from uno_tpu.ops import spectral

    s = 88
    model = build_model("uno9", in_width=3, width=8, pad=1)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, s, s, 1)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((2, s, s, 1)), jnp.float32)

    spectral.set_dft_mode(True)
    try:
        monkeypatch.delenv("UNO_TPU_NO_FUSED_SKIPS", raising=False)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        loss_f, grads_f = _loss_and_grads(model, params, x, y)

        monkeypatch.setenv("UNO_TPU_NO_FUSED_SKIPS", "1")
        loss_m, grads_m = _loss_and_grads(model, params, x, y)
    finally:
        spectral.set_dft_mode(None)

    np.testing.assert_allclose(float(loss_f), float(loss_m), rtol=2e-6)
    for (pa, gf), gm in zip(
        jax.tree_util.tree_leaves_with_path(grads_f), jax.tree.leaves(grads_m)
    ):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gm), rtol=2e-4, atol=2e-6,
            err_msg=str(pa),
        )
