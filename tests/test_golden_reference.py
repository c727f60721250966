"""Golden end-to-end parity vs the PyTorch reference implementation.

Skipped automatically when /root/reference is not mounted.  Transplants the
reference model's torch weights into the uno_tpu parameter pytree and
asserts forward outputs agree to f32 tolerance — the BASELINE.json
"rel-L2 within 1% of the PyTorch repo" contract, checked at init.
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
    import torch

    torch.manual_seed(0)


def _t2n(t):
    return t.detach().cpu().numpy()


def _map_params(model, params, torch_model, block_attrs, lift_attr="fc_n1"):
    """Overwrite the flax param pytree with the torch model's weights."""
    import torch

    p = jax.tree.map(np.asarray, params["params"])
    sd = {k: v for k, v in torch_model.state_dict().items()}

    def set_dense(flax_name, torch_prefix):
        p[flax_name]["kernel"] = _t2n(sd[f"{torch_prefix}.weight"]).T
        p[flax_name]["bias"] = _t2n(sd[f"{torch_prefix}.bias"])

    set_dense("fc", lift_attr)
    set_dense("fc0", "fc0")
    set_dense("fc1", "fc1")
    set_dense("fc2", "fc2")

    for i, attr in enumerate(block_attrs):
        blk = p[f"block{i}"]
        n_w = blk["conv"]["weights"].shape[0]
        ws = [
            _t2n(sd[f"{attr}.conv.weights{j + 1}"]) for j in range(n_w)
        ]
        blk["conv"]["weights"] = np.stack(ws).astype(np.complex64)
        wconv = _t2n(sd[f"{attr}.w.conv.weight"])  # (Co, Ci, 1..)
        blk["w"]["kernel"] = wconv.reshape(wconv.shape[0], wconv.shape[1]).T
        blk["w"]["bias"] = _t2n(sd[f"{attr}.w.conv.bias"])
        if f"{attr}.normalize_layer.weight" in sd:
            blk["norm_scale"] = _t2n(sd[f"{attr}.normalize_layer.weight"])
            blk["norm_bias"] = _t2n(sd[f"{attr}.normalize_layer.bias"])
    return {"params": jax.tree.map(jnp.asarray, p)}


def _rel_l2(a, b):
    return float(np.linalg.norm(a - b) / np.linalg.norm(b))


def test_uno9_darcy_parity():
    import torch
    from darcy_flow_uno2d import UNO_9

    from uno_tpu.models import build_model

    tm = UNO_9(3, 16, pad=3).eval()
    model = build_model("uno9", in_width=3, width=16, pad=3)

    x = np.random.default_rng(0).standard_normal((2, 85, 85, 1)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = _map_params(
        model, params, tm, ["conv0", "conv1", "conv2", "conv4", "conv5"]
    )
    with torch.no_grad():
        want = _t2n(tm(torch.from_numpy(x)))
    got = np.asarray(model.apply(params, jnp.asarray(x)))
    assert got.shape == want.shape
    rel = _rel_l2(got, want)
    assert rel < 1e-4, rel


def test_uno_ns2d_parity():
    import torch
    from navier_stokes_uno2d import UNO

    from uno_tpu.models import build_model

    tm = UNO(14, 16).eval()
    model = build_model("uno", in_width=14, width=16, pad=0)

    x = np.random.default_rng(1).standard_normal((2, 64, 64, 10)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = _map_params(
        model, params, tm, [f"L{i}" for i in range(7)], lift_attr="fc"
    )
    with torch.no_grad():
        want = _t2n(tm(torch.from_numpy(x)))
    got = np.asarray(model.apply(params, jnp.asarray(x)))
    rel = _rel_l2(got, want)
    assert rel < 1e-4, rel


def test_uno3d_t40_parity():
    import torch
    from navier_stokes_uno3d import Uno3D_T40

    from uno_tpu.models import build_model

    tm = Uno3D_T40(6, 4, pad=3).eval()
    model = build_model("uno3d_t40", in_width=6, width=4, pad=3)

    x = np.random.default_rng(2).standard_normal((1, 64, 64, 10, 1)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = _map_params(
        model,
        params,
        tm,
        ["conv0", "conv1", "conv2", "conv3", "conv6", "conv7", "conv8"],
        lift_attr="fc",
    )
    with torch.no_grad():
        want = _t2n(tm(torch.from_numpy(x)))
    got = np.asarray(model.apply(params, jnp.asarray(x)))
    assert got.shape == want.shape
    rel = _rel_l2(got, want)
    assert rel < 1e-4, rel


def test_uno_p_parity():
    import torch
    from navier_stokes_uno2d import UNO_P

    from uno_tpu.models import build_model

    tm = UNO_P(14, 16, pad=2).eval()
    model = build_model("uno_p", in_width=14, width=16, pad=2)

    x = np.random.default_rng(3).standard_normal((2, 64, 64, 10)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = _map_params(
        model, params, tm, [f"L{i}" for i in range(7)], lift_attr="fc"
    )
    with torch.no_grad():
        want = _t2n(tm(torch.from_numpy(x)))
    got = np.asarray(model.apply(params, jnp.asarray(x)))
    rel = _rel_l2(got, want)
    assert rel < 1e-4, rel


def test_uno3d_t20_parity():
    import torch
    from navier_stokes_uno3d import Uno3D_T20

    from uno_tpu.models import build_model

    tm = Uno3D_T20(6, 4, pad=2).eval()
    model = build_model("uno3d_t20", in_width=6, width=4, pad=2)

    x = np.random.default_rng(4).standard_normal((1, 64, 64, 10, 1)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = _map_params(
        model,
        params,
        tm,
        ["conv0", "conv1", "conv2", "conv3", "conv6", "conv7", "conv8"],
        lift_attr="fc",
    )
    with torch.no_grad():
        want = _t2n(tm(torch.from_numpy(x)))
    got = np.asarray(model.apply(params, jnp.asarray(x)))
    assert got.shape == want.shape
    rel = _rel_l2(got, want)
    assert rel < 1e-4, rel


def test_uno3d_t9_parity():
    import torch
    from navier_stokes_uno3d import Uno3D_T9

    from uno_tpu.models import build_model

    tm = Uno3D_T9(6, 4, pad=2).eval()
    model = build_model("uno3d_t9", in_width=6, width=4, pad=2)

    x = np.random.default_rng(5).standard_normal((1, 64, 64, 6, 1)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = _map_params(
        model,
        params,
        tm,
        ["conv0", "conv1", "conv2", "conv3", "conv6", "conv7", "conv8"],
        lift_attr="fc",
    )
    with torch.no_grad():
        want = _t2n(tm(torch.from_numpy(x)))
    got = np.asarray(model.apply(params, jnp.asarray(x)))
    assert got.shape == want.shape
    rel = _rel_l2(got, want)
    assert rel < 1e-4, rel


@pytest.mark.slow
def test_uno_s256_parity():
    import torch
    from navier_stokes_uno2d import UNO_S256

    from uno_tpu.models import build_model

    tm = UNO_S256(14, 8).eval()
    model = build_model("uno_s256", in_width=14, width=8, pad=0)

    x = np.random.default_rng(6).standard_normal((1, 256, 256, 10)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = _map_params(
        model, params, tm, [f"L{i}" for i in range(7)], lift_attr="fc"
    )
    with torch.no_grad():
        want = _t2n(tm(torch.from_numpy(x)))
    got = np.asarray(model.apply(params, jnp.asarray(x)))
    rel = _rel_l2(got, want)
    assert rel < 1e-4, rel
