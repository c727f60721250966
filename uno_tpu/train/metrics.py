"""Structured metrics logging.

The reference prints bare tuples (train_darcy.py:84).  Here every record is
one JSON line on stdout (machine-parseable) with wall-clock and throughput,
plus an optional TensorBoard writer hook.
"""

from __future__ import annotations

import json
import sys
import time
from typing import Any, Dict, Optional


class MetricLogger:
    def __init__(self, stream=None, tensorboard_dir: Optional[str] = None):
        self.stream = stream or sys.stdout
        self._tb = None
        if tensorboard_dir:
            try:
                from flax.metrics import tensorboard

                self._tb = tensorboard.SummaryWriter(tensorboard_dir)
            except Exception:
                self._tb = None

    def log(self, record: Dict[str, Any]) -> None:
        record = {"t": round(time.time(), 3), **record}
        self.stream.write(json.dumps(record, default=float) + "\n")
        self.stream.flush()
        if self._tb is not None and "step" in record:
            for k, v in record.items():
                if isinstance(v, (int, float)) and k not in ("step", "t"):
                    self._tb.scalar(k, v, record["step"])
