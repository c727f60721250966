"""Device mesh construction and sharding policy.

The reference is single-process single-GPU (SURVEY.md §2.5: zero distributed
machinery); parallelism here is net-new, TPU-first:

* ``make_mesh`` builds a ``jax.sharding.Mesh`` over ICI; axes:
    - ``data``    — batch (the primary strategy; reproduces every reference
      config when the batch divides the chip count)
    - ``spatial`` — optional domain decomposition of the leading grid axis
      for resolutions that overflow one chip (421² Darcy / 256² NS); the
      spectral conv's FFTs then incur XLA-inserted all-to-alls over ICI —
      the operator-learning analogue of sequence parallelism.
* Gradient reduction is implicit: batch-sharded inputs + replicated params
  under ``jit`` make XLA emit the psum over ``data`` — no hand-written
  collectives (the NCCL-DDP equivalent is the compiler).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_spatial: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_spatial
    if n_data < 1 or n_data * n_spatial > len(devices):
        raise ValueError(
            f"mesh {n_data} data x {n_spatial} spatial needs "
            f"{max(n_data, 1) * n_spatial} devices, have {len(devices)}"
        )
    arr = np.asarray(devices[: n_data * n_spatial]).reshape(n_data, n_spatial)
    return Mesh(arr, ("data", "spatial"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) over 'data'; everything else replicated."""
    return NamedSharding(mesh, P("data"))


def batch_spatial_sharding(mesh: Mesh) -> NamedSharding:
    """Shard batch over 'data' and the first grid axis over 'spatial'."""
    return NamedSharding(mesh, P("data", "spatial"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Optional[Mesh], *arrays):
    """device_put arrays with batch sharding (no-op without a mesh)."""
    if mesh is None:
        return arrays if len(arrays) > 1 else arrays[0]
    s = batch_sharding(mesh)
    out = tuple(jax.device_put(a, s) for a in arrays)
    return out if len(out) > 1 else out[0]


def replicate(mesh: Optional[Mesh], tree):
    if mesh is None:
        return tree
    s = replicated(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, s), tree)
