"""Model summary: the torchsummary.summary equivalent used by the reference
drivers as a shape smoke test (darcy_flow_main.py:97)."""

from __future__ import annotations

from typing import Any

import jax
import numpy as np


def count_params(params: Any) -> int:
    leaves = jax.tree.leaves(params)
    return sum(int(np.prod(l.shape)) for l in leaves)


def param_bytes(params: Any) -> int:
    leaves = jax.tree.leaves(params)
    return sum(int(np.prod(l.shape)) * l.dtype.itemsize for l in leaves)


def summarize(model, x, params=None) -> str:
    """Tabulate the model: flax's own tabulation plus totals."""
    if params is None:
        params = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), x)
        )
    lines = []
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    total = 0
    for path, leaf in flat:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        n = int(np.prod(leaf.shape))
        total += n
        lines.append(f"{name:70s} {str(leaf.shape):24s} {str(leaf.dtype):10s} {n:>12,}")
    lines.append("-" * 120)
    lines.append(f"{'total parameters':70s} {'':24s} {'':10s} {total:>12,}")
    return "\n".join(lines)
