"""Zero-shot super-resolution: train at one grid, evaluate at 2x
(BASELINE.json config 5; exercises the discretization-invariance contract
end-to-end through training)."""

import numpy as np
import pytest

import jax

from uno_tpu.data import generate_darcy_batch
from uno_tpu.models import build_model
from uno_tpu.train import TrainConfig, train_darcy
from uno_tpu.train.evaluate import evaluate_superres
from uno_tpu.train.metrics import MetricLogger


class _Silent(MetricLogger):
    def __init__(self):
        self.records = []

    def log(self, r):
        self.records.append(r)


@pytest.mark.slow
def test_train_small_eval_2x():
    # generate at 169², subsample ::2 to 85² for training (UNO_9's mode
    # counts need >=72² grids, matching the reference's own constraint)
    a_hi, p_hi = generate_darcy_batch(jax.random.PRNGKey(0), 40, 169, maxiter=3000)
    a_hi, p_hi = np.asarray(a_hi)[..., None], np.asarray(p_hi)
    a_lo, p_lo = a_hi[:, ::2, ::2], p_hi[:, ::2, ::2]

    model = build_model("uno9", in_width=3, width=16, pad=1)
    cfg = TrainConfig(epochs=10, batch_size=8, learning_rate=2e-3, weight_decay=0.0)
    out = train_darcy(
        model,
        a_lo[:28], p_lo[:28], a_lo[28:34], p_lo[28:34], a_lo[34:], p_lo[34:],
        cfg, logger=_Silent(),
    )
    res = evaluate_superres(
        model, out["params"],
        a_lo[34:], p_lo[34:], a_hi[34:], p_hi[34:],
    )
    assert np.isfinite(res["rel_l2_super_res"])
    # training made progress beyond a trivial predictor...
    assert res["rel_l2_train_res"] < 1.0
    # ...and the same weights transfer to the finer grid comparably
    assert res["rel_l2_super_res"] < 2.0 * res["rel_l2_train_res"] + 0.1, res
