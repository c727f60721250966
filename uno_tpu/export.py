"""AOT model export — the serving/deployment surface (net-new vs the
reference, which can only re-run its Python).

``jax.export`` serializes the jitted forward pass as a versioned StableHLO
artifact.  A serving process loads it WITHOUT uno_tpu's model-building code
(only jax), and with ``platforms`` set the artifact can be lowered for a
target the exporting host lacks (e.g. export on a CPU build host, serve on
TPU).  Trained parameters are baked into the artifact as constants, so the
artifact is a single self-contained file.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def export_forward(
    model,
    params,
    sample,
    path: Optional[str] = None,
    platforms: Optional[Sequence[str]] = None,
) -> bytes:
    """Serialize ``model.apply(params, .)`` as a StableHLO artifact.

    ``sample`` fixes the input shape/dtype (XLA is static-shape; export one
    artifact per serving shape).  Returns the bytes; also writes them to
    ``path`` when given.
    """
    fwd = jax.jit(lambda x: model.apply(params, x))
    exp = jax.export.export(
        fwd, platforms=tuple(platforms) if platforms else None
    )(jax.ShapeDtypeStruct(jnp.shape(sample), jnp.asarray(sample).dtype))
    data = exp.serialize()
    if path:
        with open(path, "wb") as f:
            f.write(data)
    return data


def load_forward(path_or_bytes):
    """Load an exported artifact; returns a callable ``fn(x) -> y``."""
    data = (
        path_or_bytes
        if isinstance(path_or_bytes, (bytes, bytearray))
        else open(path_or_bytes, "rb").read()
    )
    exp = jax.export.deserialize(bytearray(data))
    return exp.call
