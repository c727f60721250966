"""Explicit shard_map data parallelism.

The default DP path lets jit insert the gradient reduction from shardings
(``parallel/mesh.py``).  This module is the explicit-collective variant —
per-device loss/grad with a ``psum`` over the 'data' axis, the TPU-native
equivalent of NCCL DDP's all-reduce — useful when the update must be
hand-scheduled or fused with other collectives.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
from jax.sharding import Mesh, PartitionSpec as P

from jax import shard_map  # jax>=0.8


def dp_value_and_grad(loss_fn: Callable, mesh: Mesh):
    """Returns f(params, x, y) -> (global_loss, averaged_grads) where x, y
    are batch-sharded over 'data' and params are replicated.

    loss_fn must return a per-shard SUM (not mean); the psum makes it the
    global sum, matching single-device semantics exactly.
    """

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P("data"), P("data")),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def fn(params, x, y):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, y)
        loss = jax.lax.psum(loss, "data")
        grads = jax.lax.psum(grads, "data")
        return loss, grads

    return fn
