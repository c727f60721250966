"""Complex-parameter-aware Adam and the StepLR schedule, as optax transforms.

The reference ships a custom Adam (Adam.py:8-52) whose only deviation from
stock torch-1.11 Adam is the second-moment update
``nu += (1-b2) * grad * grad.conj()`` — correct for the cfloat spectral
weights (stock torch-1.11 Adam squared complex grads without conj).  Weight
decay is **non-decoupled L2**: ``grad = grad + wd * param`` applied before
the moment updates (Adam.py:36-37), including on complex leaves.

Implemented here natively over pytrees with complex64 leaves:

* ``mu``    — same dtype as the parameter (complex for spectral weights);
* ``nu``    — always real: ``|g|^2 = re^2 + im^2`` shares one second moment
  across the re/im parts of a complex weight (this is the reference
  semantics, and differs from treating re/im as independent reals);
* update  — ``-lr/bias1 * mu / (sqrt(nu/bias2) + eps)``.

StepLR (torch.optim.lr_scheduler.StepLR as used in train_darcy.py:38):
lr multiplied by ``gamma`` every ``step_size`` epochs; expressed as an optax
staircase schedule over *epochs* — trainers pass the epoch index as the
schedule count by stepping the schedule once per optimizer step with
``steps_per_epoch`` scaling.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class ComplexAdamState(NamedTuple):
    count: jax.Array
    mu: optax.Updates
    nu: optax.Updates
    max_nu: Optional[optax.Updates] = None


def _real_zeros_like(p):
    return jnp.zeros(p.shape, jnp.float32)


def _flat_groups(tree):
    """Split a pytree's leaves into one flat complex and one flat real
    buffer (plus the recipe to undo it).

    The per-leaf Adam math costs ~8 small fused kernels per leaf — ~200
    dispatches per step on UNO_9's 27 leaves, a measurable slice of an
    op-count-bound TPU step (PERF.md).  Concatenating each dtype group
    into ONE buffer runs the whole update in a handful of large ops; the
    elementwise math is identical, so this is bit-compatible with the
    per-leaf path (tests/test_optim.py pins it).
    """
    leaves, treedef = jax.tree.flatten(tree)
    kinds = tuple(
        "c" if jnp.iscomplexobj(l) else "r" for l in leaves
    )
    bufs = {}
    for kind in ("c", "r"):
        group = [l.ravel() for l, k in zip(leaves, kinds) if k == kind]
        if group:
            bufs[kind] = (
                group[0] if len(group) == 1 else jnp.concatenate(group)
            )

    def unflatten(flat_bufs):
        out, pos = [], {"c": 0, "r": 0}
        for leaf, kind in zip(leaves, kinds):
            n = leaf.size
            seg = jax.lax.dynamic_slice_in_dim(
                flat_bufs[kind], pos[kind], n
            )
            out.append(seg.reshape(leaf.shape))
            pos[kind] += n
        return jax.tree.unflatten(treedef, out)

    return bufs, unflatten


def complex_adam(
    learning_rate: optax.ScalarOrSchedule,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    amsgrad: bool = False,
    fused: bool = False,
) -> optax.GradientTransformation:
    """Reference-parity Adam over pytrees with real and complex leaves.

    ``fused=True`` runs the update on per-dtype flattened buffers (same
    math, ~10 ops instead of ~8 per leaf); the optimizer state is then
    flat, so checkpoints are not interchangeable with ``fused=False``.
    """
    if fused:
        return _fused_complex_adam(
            learning_rate, b1, b2, eps, weight_decay, amsgrad
        )

    def init_fn(params):
        mu = jax.tree.map(jnp.zeros_like, params)
        nu = jax.tree.map(_real_zeros_like, params)
        max_nu = jax.tree.map(_real_zeros_like, params) if amsgrad else None
        return ComplexAdamState(jnp.zeros([], jnp.int32), mu, nu, max_nu)

    def update_fn(updates, state, params=None):
        # jax.grad's complex convention returns the CONJUGATE of the descent
        # gradient (for f: C->R, descend via z - lr*conj(grad f) — JAX
        # autodiff cookbook); torch's autograd hands the reference Adam the
        # descent-ready gradient directly.  Conjugate here so the imaginary
        # parts of complex spectral weights descend (no-op on real leaves).
        updates = jax.tree.map(jnp.conj, updates)
        if weight_decay != 0.0:
            if params is None:
                raise ValueError("complex_adam with weight_decay needs params")
            updates = jax.tree.map(
                lambda g, p: g + weight_decay * p, updates, params
            )
        count = state.count + 1
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)

        mu = jax.tree.map(
            lambda m, g: b1 * m + (1.0 - b1) * g, state.mu, updates
        )
        nu = jax.tree.map(
            lambda v, g: b2 * v + (1.0 - b2) * jnp.real(g * jnp.conj(g)),
            state.nu,
            updates,
        )
        if amsgrad:
            max_nu = jax.tree.map(jnp.maximum, state.max_nu, nu)
            denom_src = max_nu
        else:
            max_nu = None
            denom_src = nu

        lr = learning_rate(count) if callable(learning_rate) else learning_rate
        step_size = lr / bc1

        def _delta(m, v):
            denom = jnp.sqrt(v) / jnp.sqrt(bc2) + eps
            return (-step_size * m / denom).astype(m.dtype)

        new_updates = jax.tree.map(_delta, mu, denom_src)
        return new_updates, ComplexAdamState(count, mu, nu, max_nu)

    return optax.GradientTransformation(init_fn, update_fn)


def _fused_complex_adam(
    learning_rate, b1, b2, eps, weight_decay, amsgrad
) -> optax.GradientTransformation:
    """complex_adam over per-dtype flattened buffers (see _flat_groups)."""
    inner = complex_adam(
        learning_rate, b1, b2, eps, weight_decay, amsgrad
    )

    def init_fn(params):
        bufs, _ = _flat_groups(params)
        return inner.init(bufs)

    def update_fn(updates, state, params=None):
        gbufs, unflatten = _flat_groups(updates)
        pbufs = _flat_groups(params)[0] if params is not None else None
        flat_updates, state = inner.update(gbufs, state, pbufs)
        return unflatten(flat_updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def step_lr(
    base_lr: float,
    step_size_epochs: int,
    gamma: float,
    steps_per_epoch: int,
):
    """StepLR as an optax schedule over optimizer steps.

    lr(step) = base_lr * gamma ** (epoch // step_size_epochs) with
    epoch = step // steps_per_epoch — identical trajectory to torch's
    StepLR stepped once per epoch.
    """

    def schedule(count):
        # count is 1-based inside complex_adam's update; step k of epoch e
        # satisfies (count-1)//steps_per_epoch == e.
        epoch = jnp.maximum(count - 1, 0) // steps_per_epoch
        return base_lr * gamma ** (epoch // step_size_epochs).astype(
            jnp.float32
        )

    return schedule
