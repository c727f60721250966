"""Channel tensor-parallel parameter placement (SURVEY.md §2.5, TP analogue).

The reference is single-GPU (no TP anywhere); this is net-new TPU-first
design.  The U-NO layer zoo is channel-structured — every parameter has
one out-channel axis — so column-parallel sharding is a *placement
policy*, not a model rewrite: shard each parameter's out-channel axis
over the mesh's ``spatial`` axis with ``NamedSharding`` and let GSPMD
partition each layer's channel contraction (the per-mode spectral einsum,
the 1x1 convs, the lift/projection dots) and insert the gathers over ICI.

Out-channel axes by parameter name (see nn/layers.py):

* ``kernel``                — Dense / PointwiseOp, ``(in, out)``  -> axis 1
* ``weights``               — SpectralConv, ``(blocks, Ci, Co, *modes)`` -> axis 2
* ``bias`` / ``norm_scale`` / ``norm_bias`` — ``(out,)``          -> axis 0

Optimizer moments (``ComplexAdamState.mu/nu/max_nu``) mirror the param
tree, so their leaf paths end in the same names and the same rule places
them — one function shards a whole ``TrainState``.

Axes that do not divide the mesh axis (e.g. the out_dim=1 projection)
stay replicated: correctness first, GSPMD still partitions every layer
whose channels do divide.  Equality vs the replicated step is pinned by
tests/test_tensor_parallel.py; ``__graft_entry__.dryrun_multichip``
exercises the same placement on the driver's virtual mesh.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# parameter-name -> out-channel axis (nn/layers.py param shapes)
_OUT_AXIS = {
    "kernel": 1,
    "weights": 2,
    "bias": 0,
    "norm_scale": 0,
    "norm_bias": 0,
}


def _leaf_name(path) -> str:
    """Trailing dict key of a tree path ('' for positional-only paths)."""
    for entry in reversed(path):
        key = getattr(entry, "key", None)
        if isinstance(key, str):
            return key
    return ""


def tp_spec(path, leaf, n_tp: int, axis_name: str = "spatial") -> P:
    """PartitionSpec sharding ``leaf``'s out-channel axis over ``axis_name``.

    Replicated when the name is unknown, the axis is out of range, or the
    dimension does not divide the mesh axis size.
    """
    ax = _OUT_AXIS.get(_leaf_name(path))
    shape = getattr(leaf, "shape", ())
    if (
        ax is None
        or n_tp <= 1
        or len(shape) <= ax
        or shape[ax] % n_tp != 0
        or shape[ax] < n_tp
    ):
        return P()
    spec = [None] * len(shape)
    spec[ax] = axis_name
    return P(*spec)


def shard_state_tp(mesh: Mesh, tree, axis_name: str = "spatial"):
    """device_put every leaf of ``tree`` (params or a whole TrainState)
    with its column-parallel sharding; non-channel leaves replicate."""
    n_tp = mesh.shape.get(axis_name, 1)
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: jax.device_put(
            leaf, NamedSharding(mesh, tp_spec(path, leaf, n_tp, axis_name))
        ),
        tree,
    )


def place_state(mesh, state, tensor_parallel: bool = False):
    """Trainer-facing placement: TP-shard or replicate a TrainState."""
    from uno_tpu.parallel.mesh import replicate

    if mesh is None:
        return state
    if tensor_parallel:
        return shard_state_tp(mesh, state)
    return replicate(mesh, state)
