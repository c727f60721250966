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


@jax.jit
def _split_complex(x):
    return jnp.stack([jnp.real(x), jnp.imag(x)], -1)


@jax.jit
def _concat_flat(xs):
    return jnp.concatenate([jnp.ravel(a) for a in xs])


def _to_numpy(tree):
    """Device->host with complex leaves encoded as trailing (re, im) pairs.

    Complex device-to-host transfers hang on some TPU runtimes (observed on
    the axon relay); the re/im split runs on device so only real arrays ever
    cross the boundary.  ``_decode`` (driven by a template) reassembles.

    All device leaves of one dtype are flattened into a single buffer on
    device and moved host-side in ONE transfer (then split/reshaped on the
    host): a full train state is ~100 leaves, and each separate d2h is a
    relay round-trip that has been observed to wedge — one call per dtype
    (typically 2-3 total) minimizes exposure and save latency.
    """

    leaves, treedef = jax.tree.flatten(tree)
    prepared = [
        _split_complex(x)
        if isinstance(x, jax.Array)
        and jnp.issubdtype(x.dtype, jnp.complexfloating)
        else x
        for x in leaves
    ]
    groups = {}
    for i, x in enumerate(prepared):
        if isinstance(x, jax.Array):
            groups.setdefault(str(x.dtype), []).append(i)
    out = list(prepared)
    for idxs in groups.values():
        arrs = [prepared[i] for i in idxs]
        flat = _concat_flat(arrs)
        host = np.asarray(flat)  # the one d2h for this dtype
        off = 0
        for i, a in zip(idxs, arrs):
            n = int(np.prod(a.shape)) if a.shape else 1
            out[i] = host[off : off + n].reshape(a.shape)
            off += n
    out = [x if isinstance(x, np.ndarray) else np.asarray(x) for x in out]
    return jax.tree.unflatten(treedef, out)


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
            import shutil

            # Never leave a window with no valid checkpoint on disk: write
            # to a sibling tmp dir, then swap via renames.  Watchdogs
            # SIGKILL wedged trainers mid-save (relay d2h hangs — see
            # _to_numpy); the previous delete-then-save ordering would have
            # lost the only resume point to such a kill.
            path = self._path(name)
            tmp, old = path + ".tmp", path + ".old"
            if not os.path.exists(path) and os.path.isdir(old):
                # a prior save crashed between its two renames: promote the
                # fallback back to primary BEFORE anything is deleted, so a
                # wedge inside the orbax write below cannot orphan it
                os.rename(old, path)
            if os.path.exists(tmp):
                shutil.rmtree(tmp)
            self._orbax.save(tmp, tree)
            if os.path.exists(path):
                shutil.rmtree(old, ignore_errors=True)
                os.rename(path, old)
            os.rename(tmp, path)
            shutil.rmtree(old, ignore_errors=True)
        else:
            save_pytree(self._path(name) + ".pkl", tree)

    def restore(self, name: str, template: Optional[Any] = None) -> Any:
        from flax import serialization

        if self._orbax is not None and (
            os.path.isdir(self._path(name))
            or os.path.isdir(self._path(name) + ".old")
        ):
            path = self._path(name)
            if not os.path.isdir(path):
                path += ".old"  # crashed between the save()-swap renames
            restored = self._orbax.restore(path)
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
        return (
            os.path.isdir(self._path(name))
            or os.path.isdir(self._path(name) + ".old")
            or os.path.exists(self._path(name) + ".pkl")
        )
