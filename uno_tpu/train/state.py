"""Training state pytree."""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation) -> "TrainState":
        # jit: eager ops on complex arrays are unimplemented on some TPU
        # runtimes (axon); under jit they lower fine.
        return cls(
            params=params,
            opt_state=jax.jit(tx.init)(params),
            step=jnp.zeros([], jnp.int32),
        )


def apply_updates(params, updates):
    """optax.apply_updates breaks on mixed real/complex trees in some
    versions; plain tree add is exact here."""
    return jax.tree.map(lambda p, u: p + u, params, updates)
