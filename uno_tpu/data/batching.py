"""Minimal host-side batching: shuffled epoch iteration over device arrays.

The reference wraps everything in torch DataLoaders (darcy_flow_main.py:83-93)
with shuffle=True and per-batch host->device copies.  On TPU the datasets
(≤ a few GB) fit in HBM, so we transfer once and index on device — the
host<->device boundary disappears from the hot loop.
"""

from __future__ import annotations

from typing import Iterator

import jax
import numpy as np

Array = jax.Array


def epoch_batches(
    rng: np.random.Generator,
    n: int,
    batch_size: int,
    shuffle: bool = True,
    drop_remainder: bool = False,
) -> Iterator[np.ndarray]:
    """Yield index arrays for one epoch."""
    idx = rng.permutation(n) if shuffle else np.arange(n)
    end = (n // batch_size) * batch_size if drop_remainder else n
    for i in range(0, end, batch_size):
        yield idx[i : i + batch_size]


def num_batches(n: int, batch_size: int, drop_remainder: bool = False) -> int:
    return n // batch_size if drop_remainder else -(-n // batch_size)
