"""AOT export (uno_tpu/export.py): serialized-artifact parity and
cross-platform lowering — the serving-deployment contract."""

import jax
import jax.numpy as jnp
import numpy as np

from uno_tpu.export import export_forward, load_forward
from uno_tpu.models import build_model


def _tiny_model_and_input():
    model = build_model("uno9", in_width=3, width=8, pad=1)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 85, 85, 1)), jnp.float32
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    return model, params, x


def test_export_roundtrip_parity(tmp_path):
    model, params, x = _tiny_model_and_input()
    path = str(tmp_path / "m.stablehlo")
    data = export_forward(model, params, x, path=path)
    assert len(data) > 1e5  # params baked in as constants

    fn = load_forward(path)  # load from file, no model code needed
    got = np.asarray(fn(x))
    want = np.asarray(model.apply(params, x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_export_ns_families_roundtrip():
    """ns2d rollout-step and ns3d one-shot models export+serve identically."""
    rng = np.random.default_rng(1)

    m2 = build_model("uno", in_width=14, width=8, pad=0)
    x2 = jnp.asarray(rng.standard_normal((1, 64, 64, 10)), jnp.float32)
    p2 = jax.jit(m2.init)(jax.random.PRNGKey(1), x2)
    fn2 = load_forward(export_forward(m2, p2, x2))
    np.testing.assert_allclose(
        np.asarray(fn2(x2)), np.asarray(m2.apply(p2, x2)), rtol=1e-5, atol=1e-5
    )

    m3 = build_model("uno3d_t10", in_width=6, width=4, pad=2)
    x3 = jnp.asarray(rng.standard_normal((1, 64, 64, 10, 1)), jnp.float32)
    p3 = jax.jit(m3.init)(jax.random.PRNGKey(2), x3)
    fn3 = load_forward(export_forward(m3, p3, x3))
    np.testing.assert_allclose(
        np.asarray(fn3(x3)), np.asarray(m3.apply(p3, x3)), rtol=1e-5, atol=1e-5
    )


def test_export_cross_platform_lowering():
    """Export on this (CPU) host with a TPU lowering included — the
    build-host-exports / TPU-serves deployment shape."""
    model, params, x = _tiny_model_and_input()
    data = export_forward(model, params, x, platforms=("cpu", "tpu"))
    fn = load_forward(data)  # callable on the current (cpu) platform
    np.testing.assert_allclose(
        np.asarray(fn(x)), np.asarray(model.apply(params, x)),
        rtol=1e-5, atol=1e-5,
    )
