from uno_tpu.train.checkpoint import CheckpointManager
from uno_tpu.train.common import BestTracker, TrainConfig, make_optimizer
from uno_tpu.train.darcy import train_darcy
from uno_tpu.train.evaluate import (
    evaluate_darcy,
    evaluate_ns2d,
    evaluate_ns3d,
    evaluate_superres,
)
from uno_tpu.train.metrics import MetricLogger
from uno_tpu.train.ns2d import make_rollout, train_ns2d
from uno_tpu.train.ns3d import train_ns3d
from uno_tpu.train.state import TrainState, apply_updates

__all__ = [
    "CheckpointManager",
    "BestTracker",
    "TrainConfig",
    "make_optimizer",
    "train_darcy",
    "evaluate_darcy",
    "evaluate_ns2d",
    "evaluate_ns3d",
    "evaluate_superres",
    "MetricLogger",
    "make_rollout",
    "train_ns2d",
    "train_ns3d",
    "TrainState",
    "apply_updates",
]
