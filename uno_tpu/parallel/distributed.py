"""Multi-host (multi-process) scaffolding: ICI within a slice, DCN across.

The reference is single-process single-GPU (SURVEY.md §2.5); this is the
net-new TPU path for pod slices and multi-slice jobs:

* ``initialize_from_env()`` — wires ``jax.distributed.initialize`` before
  any backend use.  On Cloud TPU pods JAX auto-detects coordinator/process
  ids from the TPU metadata; elsewhere the standard env vars
  (``JAX_COORDINATOR_ADDRESS``, ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``,
  or their ``COORDINATOR_ADDRESS``/... spellings) are honored.  After it
  runs, ``jax.devices()`` spans every process, so ``make_mesh`` (which
  reshapes ``jax.devices()``) automatically builds a global data x spatial
  mesh — lay 'data' across DCN-connected slices and 'spatial' within a
  slice so the FFT/DFT collectives ride ICI.
* ``process_local_batch`` — per-host sharded data feed: each process
  device_puts only the rows of the global batch its devices own
  (``jax.make_array_from_process_local_data``), the standard JAX input
  pipeline pattern for multi-host training.

Single-process behavior is the identity, so every trainer works unchanged.
The multi-process branch is executed for real by
``tests/test_multiprocess.py``: two OS processes x 4 virtual CPU devices
form one global 8-device mesh through a localhost coordinator, run one
UNO_9 train step with the batch fed through ``process_local_batch``, and
the loss + updated-parameter checksum match the single-process 8-device
values exactly (the no-op paths are additionally covered by
tests/test_distributed.py).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

_INITIALIZED = False

_ENV_KEYS = (
    "JAX_COORDINATOR_ADDRESS",
    "COORDINATOR_ADDRESS",
    "UNO_TPU_DISTRIBUTED",
)


def initialize_from_env(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize the JAX distributed runtime when configured.

    Explicit arguments win; otherwise the call happens only when one of the
    trigger env vars is set (so single-host runs never pay the connection
    timeout).  Idempotent.  Returns True when the distributed runtime is
    (now) initialized.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return True
    explicit = coordinator_address is not None
    if not explicit and not any(os.environ.get(k) for k in _ENV_KEYS):
        return False
    kwargs = {}
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    elif os.environ.get("COORDINATOR_ADDRESS"):
        kwargs["coordinator_address"] = os.environ["COORDINATOR_ADDRESS"]
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    elif os.environ.get("NUM_PROCESSES"):
        kwargs["num_processes"] = int(os.environ["NUM_PROCESSES"])
    if process_id is not None:
        kwargs["process_id"] = process_id
    elif os.environ.get("PROCESS_ID"):
        kwargs["process_id"] = int(os.environ["PROCESS_ID"])
    jax.distributed.initialize(**kwargs)
    _INITIALIZED = True
    return True


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def process_local_batch(sharding, global_batch: np.ndarray):
    """Build a globally-sharded array from per-process local rows.

    ``global_batch`` is the full logical batch (every process passes the
    same indices through the trainer's shuffle, which is seeded, so all
    processes agree on it).  Each process materialises only the slice its
    addressable devices own; single-process this is a plain device_put.
    """
    if not is_multiprocess():
        return jax.device_put(global_batch, sharding)
    # Each device pulls exactly the rows the sharding assigns it (uneven
    # trailing shards included) — no assumption that processes own
    # contiguous process-index-ordered blocks of the batch axis (ADVICE r2:
    # the previous [lo:lo+per] slice baked that in, silently dropping rows
    # when the batch wasn't divisible).  Exercised for real by the
    # 2-process jax.distributed test (tests/test_multiprocess.py).
    return jax.make_array_from_callback(
        global_batch.shape, sharding, lambda idx: global_batch[idx]
    )
