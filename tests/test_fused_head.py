"""Pallas fused projection head (ops/pallas/mlp_head.py) vs the unfused
Dense(fc1)+gelu+Dense(fc2) path — forward, gradients, and param-tree
compatibility.  Runs in the Pallas interpreter on the CPU suite; the real
kernel path is exercised on TPU by the bench/quality runs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uno_tpu.models import build_model
from uno_tpu.nn.layers import gelu
from uno_tpu.ops.pallas.mlp_head import (
    fused_mlp_head,
    set_fused_head_mode,
)


def _rel(a, b):
    a = np.asarray(a)
    b = np.asarray(b)
    return float(
        np.linalg.norm(np.abs(a - b)) / max(np.linalg.norm(np.abs(b)), 1e-12)
    )


def _ref_head(x, k1, b1, k2, b2):
    """The unfused composition (channels-first in, like the kernel)."""
    y = jnp.moveaxis(x, 1, -1).astype(jnp.float32)
    y = gelu(y @ k1 + b1)
    out = y @ k2 + b2
    return jnp.moveaxis(out, -1, 1)


@pytest.mark.parametrize("shape,h,o", [
    ((2, 8, 37, 45), 32, 1),   # uneven S1/S2 exercise the masked tail tile
    ((1, 16, 64, 64), 64, 3),  # multi-output, exactly tiled
])
def test_fused_head_forward(shape, h, o):
    rng = np.random.default_rng(0)
    bsz, c, s1, s2 = shape
    x = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
    k1 = jnp.asarray(rng.standard_normal((c, h)) / np.sqrt(c), jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(h), jnp.float32)
    k2 = jnp.asarray(rng.standard_normal((h, o)) / np.sqrt(h), jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(o), jnp.float32)

    got = jax.jit(
        lambda *a: fused_mlp_head(*a, True)
    )(x, k1, b1, k2, b2)
    want = _ref_head(x, k1, b1, k2, b2)
    assert got.shape == (bsz, o, s1, s2)
    assert got.dtype == jnp.float32
    assert _rel(got, want) < 2e-2  # bf16-rounded input, f32 math


@pytest.mark.parametrize("shape,h,o", [
    ((2, 8, 37, 45), 32, 1),
    ((1, 16, 64, 64), 64, 3),
])
def test_fused_head_grads(shape, h, o):
    rng = np.random.default_rng(1)
    bsz, c, s1, s2 = shape
    x = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
    k1 = jnp.asarray(rng.standard_normal((c, h)) / np.sqrt(c), jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(h), jnp.float32)
    k2 = jnp.asarray(rng.standard_normal((h, o)) / np.sqrt(h), jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(o), jnp.float32)
    # a fixed cotangent through a scalar loss
    w = jnp.asarray(rng.standard_normal((bsz, o, s1, s2)), jnp.float32)

    def loss_fused(x, k1, b1, k2, b2):
        return jnp.sum(fused_mlp_head(x, k1, b1, k2, b2, True) * w)

    def loss_ref(x, k1, b1, k2, b2):
        return jnp.sum(_ref_head(x, k1, b1, k2, b2) * w)

    got = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4)))(
        x, k1, b1, k2, b2
    )
    want = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4)))(
        x, k1, b1, k2, b2
    )
    names = ["gx", "gk1", "gb1", "gk2", "gb2"]
    for n, gf, gr in zip(names, got, want):
        assert gf.shape == gr.shape, n
        assert np.isfinite(np.asarray(gf, np.float32)).all(), n
        assert _rel(gf, gr) < 3e-2, (n, _rel(gf, gr))
    assert got[0].dtype == jnp.bfloat16  # cotangent matches primal dtype


def test_fused_model_path_matches_dense_path():
    """End-to-end through UNOModel: the fused head (interpret mode) must
    match the unfused bf16 model within bf16 tolerance, with an identical
    param tree (checkpoints are interchangeable)."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 85, 85, 1)), jnp.float32)
    model = build_model("uno9", in_width=3, width=8, pad=1, dtype="bfloat16")

    set_fused_head_mode(True)
    try:
        params_f = jax.jit(model.init)(jax.random.PRNGKey(0), x)
        out_f = jax.jit(model.apply)(params_f, x)
    finally:
        set_fused_head_mode(False)
    params_d = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    out_d = jax.jit(model.apply)(params_d, x)

    assert jax.tree.structure(params_f) == jax.tree.structure(params_d)
    chk = jax.tree.map(lambda a, b: bool((a == b).all()), params_f, params_d)
    assert all(jax.tree.leaves(chk))
    assert out_f.shape == out_d.shape
    assert _rel(out_f, out_d) < 2e-2


def test_fused_model_grad_accuracy_vs_f32():
    """Training-style grads through the fused head: finite, and no further
    from the f32 ground truth than the unfused bf16 path's grads are.
    (Direct fused-vs-unfused leaf comparison is dominated by bf16 noise
    amplified through 9 operator blocks' backward — both are bf16
    approximations; what matters is that they are equally good ones.)"""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 85, 85, 1)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((2, 85, 85)), jnp.float32)
    model = build_model("uno9", in_width=3, width=8, pad=1, dtype="bfloat16")
    model32 = build_model("uno9", in_width=3, width=8, pad=1)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)

    def loss(p, fused):
        set_fused_head_mode(fused)
        try:
            out = model.apply(p, x)[..., 0]
        finally:
            set_fused_head_mode(False)
        return jnp.mean((out - y) ** 2)

    gf = jax.jit(jax.grad(lambda p: loss(p, True)))(params)
    gd = jax.jit(jax.grad(lambda p: loss(p, False)))(params)
    g32 = jax.jit(jax.grad(lambda p: jnp.mean(
        (model32.apply(p, x)[..., 0] - y) ** 2
    )))(params)

    for kp, a in jax.tree_util.tree_leaves_with_path(gf):
        b, t = gd, g32
        for k in kp:
            b, t = b[k.key], t[k.key]
        assert np.isfinite(np.asarray(a, np.float32)).all(), kp
        err_fused, err_dense = _rel(a, t), _rel(b, t)
        # as accurate as the unfused bf16 path (2x slack + bf16 floor)
        if err_fused > 2.0 * err_dense + 0.02:
            raise AssertionError(
                (jax.tree_util.keystr(kp), err_fused, err_dense)
            )
