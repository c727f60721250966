"""Standalone evaluation: metric math (fast) + CLI eval-after-train e2e.

The reference evaluates only inside its training loops (train_darcy.py
:86-100, ns_train_2d.py:74-110, ns_train_3d.py:88-115); ``cli eval`` exposes
the same metrics for any saved best-params checkpoint.
"""

import json

import numpy as np
import pytest

from uno_tpu.cli import main
from uno_tpu.train.evaluate import evaluate_ns2d, evaluate_ns3d


class _ConstModel:
    """Stand-in model: ignores params, returns a fixed field per step."""

    def __init__(self, value, out_t=1):
        self.value = value
        self.out_t = out_t

    def apply(self, params, x):
        import jax.numpy as jnp

        b, s = x.shape[0], x.shape[1]
        if x.ndim == 5:  # ns3d input (B, S, S, T_in, 1)
            return jnp.full((b, s, s, self.out_t, 1), self.value, jnp.float32)
        return jnp.full((b, s, s, 1), self.value, jnp.float32)


def test_evaluate_ns2d_metric_math():
    rng = np.random.default_rng(0)
    n, s, t_in, t_f, c = 5, 8, 3, 4, 0.7
    a = rng.standard_normal((n, s, s, t_in)).astype(np.float32)
    u = rng.standard_normal((n, s, s, t_f)).astype(np.float32)

    r = evaluate_ns2d(_ConstModel(c), {}, a, u, t_f, batch_size=2)

    def rel(pred, tgt):
        return np.linalg.norm(pred - tgt) / np.linalg.norm(tgt)

    step = sum(
        rel(np.full((s, s), c, np.float32), u[i, ..., t])
        for i in range(n) for t in range(t_f)
    ) / (n * t_f)
    traj = sum(
        rel(np.full((s, s, t_f), c, np.float32), u[i]) for i in range(n)
    ) / n
    assert np.isclose(r["step_rel_l2"], step, rtol=1e-5)
    assert np.isclose(r["traj_rel_l2"], traj, rtol=1e-5)


def test_evaluate_ns3d_metric_math():
    rng = np.random.default_rng(1)
    n, s, t_in, t_f, c = 4, 8, 2, 3, -0.3
    a = rng.standard_normal((n, s, s, t_in)).astype(np.float32)
    u = rng.standard_normal((n, s, s, t_f)).astype(np.float32)

    r = evaluate_ns3d(_ConstModel(c, out_t=t_f), {}, a, u, t_f, batch_size=3)

    def rel(pred, tgt):
        return np.linalg.norm(pred - tgt) / np.linalg.norm(tgt)

    full = sum(
        rel(np.full((s, s, t_f), c, np.float32), u[i]) for i in range(n)
    ) / n
    step = sum(
        rel(np.full((s, s), c, np.float32), u[i, ..., t])
        for i in range(n) for t in range(t_f)
    ) / (n * t_f)
    assert np.isclose(r["field_rel_l2"], full, rtol=1e-5)
    assert np.isclose(r["step_rel_l2"], step, rtol=1e-5)


@pytest.mark.slow
def test_cli_eval_after_train(tmp_path):
    cache = str(tmp_path / "darcy.npz")
    ck = str(tmp_path / "ck")
    common = [
        "--preset", "darcy_s85", "--generate",
        "--ntrain", "8", "--nval", "4", "--ntest", "4",
        "--epochs", "2", "--batch-size", "4",
        "--data-cache", cache, "--checkpoint-dir", ck,
    ]
    assert main(["train", *common]) == 0

    log = str(tmp_path / "eval.jsonl")
    assert main(["eval", *common, "--log", log]) == 0
    with open(log) as f:
        rec = json.loads(f.read().strip())
    assert rec["task"] == "darcy"
    assert 0.0 < rec["val_rel_l2"] < 10.0
    assert 0.0 < rec["test_rel_l2"] < 10.0

    # predict writes arrays whose rel-L2 reproduces eval's test metric
    out = str(tmp_path / "pred.npz")
    assert main(["predict", *common, "--out", out]) == 0
    z = np.load(out)
    assert z["pred"].shape == z["target"].shape == (4, 85, 85)
    rel = np.mean([
        np.linalg.norm(z["pred"][i] - z["target"][i])
        / np.linalg.norm(z["target"][i])
        for i in range(4)
    ])
    assert np.isclose(rel, rec["test_rel_l2"], rtol=1e-4), (
        rel, rec["test_rel_l2"]
    )

    # export the same checkpoint and check the artifact serves identically
    art = str(tmp_path / "m.stablehlo")
    assert main([
        "export", *common, "--out", art, "--serve-batch", "4",
    ]) == 0
    from uno_tpu.export import load_forward

    served = np.asarray(load_forward(art)(z["input"].astype(np.float32)))
    assert np.allclose(
        served.reshape(4, 85, 85), z["pred"], rtol=1e-5, atol=1e-5
    )
