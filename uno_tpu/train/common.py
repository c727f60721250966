"""Shared trainer machinery: config, optimizer wiring, best-val tracking."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from uno_tpu.optim import complex_adam, step_lr
from uno_tpu.train.checkpoint import CheckpointManager


@dataclass
class TrainConfig:
    epochs: int = 150
    batch_size: int = 16
    learning_rate: float = 1e-3
    scheduler_step: int = 100        # epochs between StepLR decays
    scheduler_gamma: float = 0.5
    weight_decay: float = 1e-4
    seed: int = 0
    eval_every: int = 1              # validate every k epochs (reference NS: 2)
    checkpoint_dir: Optional[str] = None
    checkpoint_every: int = 0        # full-state checkpoint every k epochs
    resume: bool = False
    drop_remainder: bool = False
    # Reference ns_train_2d.py steps the scheduler only on even epochs
    # (:74,:113 — effective step size 2x nominal).  Off by default; enable to
    # bit-match the reference schedule.
    compat_even_epoch_scheduler: bool = False
    log_tensorboard: Optional[str] = None
    # Channel tensor-parallelism (parallel/tp.py): shard every parameter's
    # out-channel axis over the mesh's 'spatial' axis instead of
    # replicating.  Mutually exclusive with spatial domain decomposition
    # (both use the 'spatial' mesh axis).
    tensor_parallel: bool = False


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int):
    eff_sched_epochs = cfg.scheduler_step * (
        2 if cfg.compat_even_epoch_scheduler else 1
    )
    schedule = step_lr(
        cfg.learning_rate, eff_sched_epochs, cfg.scheduler_gamma, steps_per_epoch
    )
    return complex_adam(schedule, weight_decay=cfg.weight_decay)


def lr_at(cfg: TrainConfig, steps_per_epoch: int, step: int) -> float:
    """Learning rate in effect at optimizer step ``step`` (for logging)."""
    eff = cfg.scheduler_step * (2 if cfg.compat_even_epoch_scheduler else 1)
    epoch = max(step - 1, 0) // steps_per_epoch
    return cfg.learning_rate * cfg.scheduler_gamma ** (epoch // eff)


def _acc_add(a, b):
    return a + b


_acc_add = jax.jit(_acc_add)


class DeviceAccumulator:
    """Sum per-step device scalars without per-step host reads.

    ``float(loss)`` after every train step forces a blocking device->host
    round trip — on the relay runtime that read is the only sync point, so
    it serializes host dispatch with device compute and dominated epoch
    walltime (e.g. Darcy S=211: ~8 s/epoch against ~1.4 s of device work).
    Chaining the sums through a tiny jitted add keeps the whole epoch's
    dispatch queue asynchronous; ``total()`` at epoch end is the single
    blocking read (and doubles as the epoch's sync fence for timing).
    """

    def __init__(self):
        self._total = None

    def add(self, x) -> None:
        self._total = x if self._total is None else _acc_add(self._total, x)

    def total(self) -> float:
        return 0.0 if self._total is None else float(self._total)


def _padded_nbytes(shape, itemsize) -> int:
    """Estimate a buffer's device footprint under TPU (8, 128) tiling.

    The minor-most dim pads to a multiple of 128 (lanes) and the
    second-minor to 8 (sublanes) — a trailing time axis of 40 costs 3.2x,
    of 10 costs 12.8x (the exact expansions XLA reported for the 256^2
    NS dataset OOM this fix exists for).
    """
    if len(shape) == 0:
        return itemsize
    dims = list(shape)
    dims[-1] = -(-dims[-1] // 128) * 128
    if len(dims) >= 2:
        dims[-2] = -(-dims[-2] // 8) * 8
    n = itemsize
    for d in dims:
        n *= d
    return n


def _best_layout_perm(shape) -> tuple:
    """Axis order (keeping axis 0, the sample axis) minimizing tile padding.

    Datasets are stored on device in this order and each gathered batch is
    transposed back — a free-ish device op — so a (n, 256, 256, 40) NS
    tensor stores as (n, 40, 256, 256) and costs 1.0x instead of 3.2x HBM.
    """
    import itertools

    ndim = len(shape)
    if ndim <= 2:
        return tuple(range(ndim))
    best, best_bytes = tuple(range(ndim)), _padded_nbytes(shape, 1)
    for tail in itertools.permutations(range(1, ndim)):
        perm = (0,) + tail
        b = _padded_nbytes([shape[i] for i in perm], 1)
        if b < best_bytes:
            best, best_bytes = perm, b
    return best


# Device-resident dataset budget (bytes of *padded* footprint, all splits
# combined).  ~16G v5e HBM minus room for params, moments, and the remat'd
# BPTT activations.  Override with UNO_TPU_DATA_HBM_BUDGET.
_DEFAULT_HBM_BUDGET = int(9e9)


class DataPlacer:
    """Dataset placement policy.

    Single-chip: the whole dataset is moved to HBM once — in a tile-
    padding-optimal axis order (``_best_layout_perm``) — and batches are
    gathered on device (no per-step host->device traffic).  If even the
    optimal layout exceeds the HBM budget the dataset stays in host RAM
    and batches are ``device_put`` per step (async, overlapped by
    ``batches``'s prefetch).  With a mesh: datasets stay in host RAM
    (arbitrary sizes rarely divide the device count) and each batch is
    device_put with batch sharding; batch sizes must divide the 'data'
    axis, so trainers force drop_remainder.
    """

    def __init__(self, mesh, *arrays, spatial: bool = True):
        import os

        self.mesh = mesh
        self.spatial_constraint = None
        self._perms = None
        if mesh is None:
            budget = int(
                os.environ.get("UNO_TPU_DATA_HBM_BUDGET", _DEFAULT_HBM_BUDGET)
            )
            perms = [_best_layout_perm(np.shape(a)) for a in arrays]
            padded = sum(
                _padded_nbytes(
                    [np.shape(a)[i] for i in perm], np.asarray(a).itemsize
                )
                for a, perm in zip(arrays, perms)
            )
            if padded <= budget:
                self._perms = perms
                self.arrays = tuple(
                    jnp.asarray(np.transpose(np.asarray(a), perm))
                    for a, perm in zip(arrays, perms)
                )
            else:
                print(
                    f"DataPlacer: padded dataset footprint {padded/1e9:.1f} "
                    f"GB exceeds HBM budget {budget/1e9:.1f} GB — keeping "
                    "data host-resident (per-batch device_put)"
                )
                self.arrays = tuple(np.asarray(a) for a in arrays)
        else:
            from uno_tpu.parallel.mesh import (
                batch_sharding,
                batch_spatial_sharding,
            )

            self.arrays = tuple(np.asarray(a) for a in arrays)
            self._sharding = batch_sharding(mesh)
            # When the mesh has a non-trivial 'spatial' axis (domain
            # decomposition for 421^2 / 256^2 grids), the grid axis is
            # sharded via an in-jit constraint — device_put demands exact
            # divisibility, while GSPMD pads uneven grid sizes internally.
            # Under tensor-parallelism the 'spatial' mesh axis shards
            # *weights* (parallel/tp.py), so the grid axis must NOT also
            # be sharded over it — trainers pass spatial=False then.
            self.spatial_constraint = (
                batch_spatial_sharding(mesh)
                if spatial and mesh.shape.get("spatial", 1) > 1
                else None
            )

    def batch(self, i, idx):
        a = self.arrays[i][idx]
        if self.mesh is None:
            if isinstance(a, np.ndarray):
                return jax.device_put(a)  # host-resident fallback (async)
            if self._perms is not None:
                perm = self._perms[i]
                if perm != tuple(range(len(perm))):
                    # undo the storage layout: batch comes back in the
                    # caller's (sample, *original axes) order
                    a = jnp.transpose(a, tuple(int(j) for j in np.argsort(perm)))
            return a
        from uno_tpu.parallel.distributed import process_local_batch

        return process_local_batch(self._sharding, a)

    def batches(self, ix, iy, idx_iter, prefetch: int = 1):
        """Yield placed (x, y) batches with ``prefetch`` batches in flight.

        ``device_put`` is asynchronous, so enqueueing the next batch before
        the current step finishes overlaps the h2d copy with compute — the
        mesh path otherwise pays a per-step host transfer (round-1 weak #7).
        """
        from collections import deque

        q = deque()
        for idx in idx_iter:
            q.append((self.batch(ix, idx), self.batch(iy, idx), idx))
            if len(q) > prefetch:
                yield q.popleft()
        while q:
            yield q.popleft()



class GracefulStop:
    """Preemption-safe shutdown: on SIGTERM/SIGINT, finish the current epoch,
    checkpoint, and return early (the reference loses everything but the
    last best-val state_dict on preemption, train_darcy.py:81-83; TPU pods
    are routinely preempted, so this is first-class here).

    Install with ``with GracefulStop() as stop:`` around the epoch loop and
    poll ``stop.requested`` at epoch boundaries.  Previous handlers are
    restored on exit; a second signal falls through to them (so a double
    Ctrl-C still kills a run immediately).
    """

    SIGNALS = ("SIGTERM", "SIGINT")

    def __init__(self):
        self.requested = False
        self._prev = {}

    def _handler(self, signum, frame):
        import signal

        self.requested = True
        # restore previous disposition: next signal is not swallowed
        signal.signal(signum, self._prev.get(signum, signal.SIG_DFL))

    def __enter__(self):
        import signal
        import threading

        if threading.current_thread() is not threading.main_thread():
            return self  # handlers only installable from the main thread
        for name in self.SIGNALS:
            sig = getattr(signal, name)
            try:
                self._prev[sig] = signal.signal(sig, self._handler)
            except (ValueError, OSError):  # non-main interpreter contexts
                pass
        return self

    def __exit__(self, *exc):
        import signal

        for sig, prev in self._prev.items():
            try:
                if signal.getsignal(sig) == self._handler:
                    signal.signal(sig, prev)
            except (ValueError, OSError):
                pass
        return False


class BestTracker:
    """Reference best-val selection: save params whenever val improves."""

    def __init__(self, ckpt: Optional[CheckpointManager] = None):
        self.best_val = float("inf")
        self.best_params = None
        self.ckpt = ckpt

    def update(self, val: float, params) -> bool:
        if val < self.best_val:
            self.best_val = val
            # jit: eager complex copies are unimplemented on some runtimes
            self.best_params = jax.jit(
                lambda p: jax.tree.map(jnp.copy, p)
            )(params)
            if self.ckpt is not None:
                self.ckpt.save("best_params", self.best_params)
            return True
        return False
