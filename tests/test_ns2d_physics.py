"""NS-2D end-to-end physics test: train the rollout on real solver data and
verify learning happens (the loss falls well below the trivial persistence
predictor's)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uno_tpu.data import GaussianRF, default_forcing, navier_stokes_2d
from uno_tpu.models import build_model
from uno_tpu.train import MetricLogger, TrainConfig, train_ns2d


class _Silent(MetricLogger):
    def __init__(self):
        self.records = []

    def log(self, r):
        self.records.append(r)


@pytest.mark.slow
def test_rollout_learns_dynamics():
    s, t_in, t_f = 64, 10, 4
    grf = GaussianRF(2, s, alpha=2.5, tau=7.0)
    f = default_forcing(s)
    w0 = grf.sample(jax.random.PRNGKey(0), 48)
    sol, _ = navier_stokes_2d(
        w0, f, visc=1e-3, T=7.0, delta_t=5e-3, record_steps=t_in + t_f
    )
    sol = np.asarray(sol)
    a = sol[..., :t_in]
    u = sol[..., t_in : t_in + t_f]

    model = build_model("uno", in_width=14, width=16, pad=0)
    cfg = TrainConfig(
        epochs=8, batch_size=8, learning_rate=2e-3, weight_decay=1e-5,
        eval_every=2,
    )
    logger = _Silent()
    out = train_ns2d(
        model, a[:32], u[:32], a[32:40], u[32:40], a[40:], u[40:],
        cfg, t_f=t_f, logger=logger,
    )

    losses = [r["train_step_rel_l2"] for r in logger.records if "train_step_rel_l2" in r]
    assert losses[-1] < losses[0], losses

    # persistence baseline: predict u(t) = last input frame
    pers = np.linalg.norm(
        (u[40:] - a[40:, :, :, -1:]).reshape(8, -1), axis=1
    ) / np.linalg.norm(u[40:].reshape(8, -1), axis=1)
    assert out["test_step_rel_l2"] < pers.mean(), (
        out["test_step_rel_l2"], pers.mean()
    )
