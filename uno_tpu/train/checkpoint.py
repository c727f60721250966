"""Checkpoint / resume with Orbax.

The reference only ever saves the best-val ``state_dict`` (train_darcy.py:83)
— a crash loses optimizer/scheduler/epoch state.  Here full training state
(params, opt_state, step, epoch, best_val, rng seed) is checkpointed so runs
are preemption-safe (step-based resume), plus a separate best-params slot
reproducing the reference's model-selection behavior.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _to_numpy(tree):
    """Device->host with complex leaves encoded as trailing (re, im) pairs.

    Complex device-to-host transfers hang on some TPU runtimes (observed on
    the axon relay); the re/im split runs on device so only real arrays ever
    cross the boundary.  ``_decode`` (driven by a template) reassembles.
    """

    def leaf(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.complexfloating):
            x = jax.jit(lambda a: jnp.stack([jnp.real(a), jnp.imag(a)], -1))(x)
        return np.asarray(x)

    return jax.tree.map(leaf, tree)


def _decode_against(template, restored):
    """Reassemble complex leaves encoded by ``_to_numpy``.

    Complex leaves are rebuilt ON DEVICE from the real pairs (host->device
    transfers of complex arrays are broken on some TPU runtimes — see
    ``_to_numpy``); real leaves stay as numpy for the caller to place.
    """

    def leaf(t, r):
        # use dtype/ndim attributes only — np.asarray(t) would d2h-transfer
        # the template (hangs for complex leaves on the axon runtime)
        r = np.asarray(r)
        td = getattr(t, "dtype", None)
        tn = getattr(t, "ndim", None)
        if (
            td is not None
            and jnp.issubdtype(td, jnp.complexfloating)
            and r.ndim == tn + 1
            and r.shape[-1] == 2
        ):
            pairs = jnp.asarray(r.astype(np.float32))
            return jax.jit(lambda p: jax.lax.complex(p[..., 0], p[..., 1]))(
                pairs
            ).astype(td)
        return r.astype(td) if td is not None else r

    return jax.tree.map(leaf, template, restored)


def save_pytree(path: str, tree: Any) -> None:
    import pickle

    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(tmp, "wb") as f:
        pickle.dump(_to_numpy(tree), f)
    os.replace(tmp, path)


def load_pytree(path: str) -> Any:
    import pickle

    with open(path, "rb") as f:
        return pickle.load(f)


class CheckpointManager:
    """Orbax-backed when available; pickle fallback (single-host)."""

    def __init__(self, directory: str, use_orbax: bool = True):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._orbax = None
        if use_orbax:
            try:
                import orbax.checkpoint as ocp

                self._orbax = ocp.PyTreeCheckpointer()
            except Exception:
                self._orbax = None

    def _path(self, name: str) -> str:
        return os.path.join(self.directory, name)

    def save(self, name: str, tree: Any) -> None:
        from flax import serialization

        # state-dict form: plain nested dicts, round-trips through any store
        tree = serialization.to_state_dict(_to_numpy(tree))
        if self._orbax is not None:
            path = self._path(name)
            if os.path.exists(path):
                import shutil

                shutil.rmtree(path)
            self._orbax.save(path, tree)
        else:
            save_pytree(self._path(name) + ".pkl", tree)

    def restore(self, name: str, template: Optional[Any] = None) -> Any:
        from flax import serialization

        if self._orbax is not None and os.path.isdir(self._path(name)):
            restored = self._orbax.restore(self._path(name))
        else:
            path = self._path(name) + ".pkl"
            if not os.path.exists(path):
                raise FileNotFoundError(self._path(name))
            restored = load_pytree(path)
        if template is not None:
            restored = serialization.from_state_dict(template, restored)
            restored = _decode_against(template, restored)
        return restored

    def exists(self, name: str) -> bool:
        return os.path.isdir(self._path(name)) or os.path.exists(
            self._path(name) + ".pkl"
        )
