"""Trainers under a data-parallel mesh (incl. non-divisible dataset sizes)."""

import numpy as np
import pytest

import jax

from uno_tpu.models import build_model
from uno_tpu.parallel import make_mesh
from uno_tpu.train import MetricLogger, TrainConfig, train_darcy

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


class _Silent(MetricLogger):
    def __init__(self):
        self.records = []

    def log(self, r):
        self.records.append(r)


def test_train_darcy_dp_uneven_dataset():
    model = build_model("uno9", in_width=3, width=8, pad=1)
    rng = np.random.default_rng(0)
    # 19 train samples: not divisible by 8 devices or the batch size
    x = rng.standard_normal((19, 85, 85, 1)).astype(np.float32)
    y = rng.standard_normal((19, 85, 85)).astype(np.float32)
    mesh = make_mesh(n_data=8)
    cfg = TrainConfig(epochs=2, batch_size=8, learning_rate=1e-3, weight_decay=0.0)
    logger = _Silent()
    out = train_darcy(
        model, x, y, x[:9], y[:9], x[:9], y[:9], cfg, mesh=mesh, logger=logger
    )
    losses = [r["train_rel_l2"] for r in logger.records if "train_rel_l2" in r]
    assert len(losses) == 2 and all(np.isfinite(losses))
    assert np.isfinite(out["test_rel_l2"])
