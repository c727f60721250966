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


def test_uno3d_t10_parity():
    import torch
    from navier_stokes_uno3d import Uno3D_T10

    from uno_tpu.models import build_model

    tm = Uno3D_T10(6, 4, pad=2).eval()
    model = build_model("uno3d_t10", in_width=6, width=4, pad=2)

    x = np.random.default_rng(7).standard_normal((1, 64, 64, 10, 1)).astype(np.float32)
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
def test_uno3d_t20_256_parity():
    import torch
    from navier_stokes_uno3d import Uno3D_T20_256

    from uno_tpu.models import build_model

    tm = Uno3D_T20_256(6, 4, pad=2).eval()
    model = build_model("uno3d_t20_256", in_width=6, width=4, pad=2)

    x = (
        np.random.default_rng(8)
        .standard_normal((1, 256, 256, 10, 1))
        .astype(np.float32)
    )
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = _map_params(
        model,
        params,
        tm,
        [f"conv{i}" for i in range(9)],
        lift_attr="fc",
    )
    with torch.no_grad():
        want = _t2n(tm(torch.from_numpy(x)))
    got = np.asarray(model.apply(params, jnp.asarray(x)))
    assert got.shape == want.shape
    rel = _rel_l2(got, want)
    assert rel < 1e-4, rel


@pytest.mark.slow
def test_uno3d_t10_256_parity():
    import torch
    from navier_stokes_uno3d import Uno3D_T10_256

    from uno_tpu.models import build_model

    tm = Uno3D_T10_256(6, 4, pad=2).eval()
    model = build_model("uno3d_t10_256", in_width=6, width=4, pad=2)

    x = (
        np.random.default_rng(9)
        .standard_normal((1, 256, 256, 10, 1))
        .astype(np.float32)
    )
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = _map_params(
        model,
        params,
        tm,
        [f"conv{i}" for i in range(9)],
        lift_attr="fc",
    )
    with torch.no_grad():
        want = _t2n(tm(torch.from_numpy(x)))
    got = np.asarray(model.apply(params, jnp.asarray(x)))
    assert got.shape == want.shape
    rel = _rel_l2(got, want)
    assert rel < 1e-4, rel


def test_ns2d_rollout_golden_bptt():
    """Golden parity of the autoregressive rollout BPTT vs the reference
    training semantics (ns_train_2d.py:52-67): per-step LpLoss summed over a
    3-step rollout, one backward through the whole chain; loss and selected
    gradients must agree."""
    import torch
    from navier_stokes_uno2d import UNO
    from utilities3 import LpLoss

    from uno_tpu.models import build_model
    from uno_tpu.train.ns2d import make_rollout

    t_f = 3
    tm = UNO(14, 16).eval()
    model = build_model("uno", in_width=14, width=16, pad=0)

    rng = np.random.default_rng(11)
    xx = rng.standard_normal((2, 64, 64, 10)).astype(np.float32)
    yy = rng.standard_normal((2, 64, 64, t_f)).astype(np.float32)

    params = model.init(jax.random.PRNGKey(0), jnp.asarray(xx))
    params = _map_params(
        model, params, tm, [f"L{i}" for i in range(7)], lift_attr="fc"
    )

    # torch: reference training-loop rollout, full backward
    myloss = LpLoss(size_average=False)
    txx = torch.from_numpy(xx)
    tyy = torch.from_numpy(yy)
    loss = 0
    cur = txx
    for t in range(t_f):
        y = tyy[..., t : t + 1]
        im = tm(cur)
        loss = loss + myloss(im.reshape(2, -1), y.reshape(2, -1))
        cur = torch.cat((cur[..., 1:], im), dim=-1)
    tm.zero_grad()
    loss.backward()
    want_loss = float(loss)
    want_gfc2 = _t2n(tm.fc2.weight.grad).T            # -> flax kernel layout
    want_gw0 = _t2n(tm.L0.conv.weights1.grad)

    # jax: the library rollout (scan + remat), one grad through the chain
    rollout = make_rollout(model, t_f)

    def loss_fn(p):
        l, _ = rollout(p, jnp.asarray(xx), jnp.asarray(yy))
        return l

    got_loss, grads = jax.value_and_grad(loss_fn)(params)
    assert abs(float(got_loss) - want_loss) / want_loss < 1e-4, (
        float(got_loss), want_loss,
    )
    g = grads["params"]
    np.testing.assert_allclose(
        np.asarray(g["fc2"]["kernel"]), want_gfc2, rtol=2e-3, atol=1e-5
    )
    # jax.grad of a real loss wrt complex params is the CONJUGATE of torch's
    # .grad convention (tests/test_optim.py) — compare accordingly.
    got_gw0 = np.conj(np.asarray(g["block0"]["conv"]["weights"][0]))
    np.testing.assert_allclose(got_gw0, want_gw0, rtol=2e-3, atol=1e-5)
