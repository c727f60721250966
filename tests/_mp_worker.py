"""Worker process for the 2-process ``jax.distributed`` CPU test.

Run as:  python tests/_mp_worker.py <process_id> <num_processes> <port>

Each worker owns 4 virtual CPU devices; together they form one global
8-device mesh.  The worker wires the distributed runtime through
``uno_tpu.parallel.initialize_from_env``, builds the global mesh with
``make_mesh`` (which spans ``jax.devices()`` across processes), feeds one
real UNO_9 train step through ``process_local_batch``, and prints the loss
plus a parameter checksum.  The pytest parent (tests/test_multiprocess.py)
runs the same ``run_step`` single-process on 8 local devices and asserts
both workers produced the identical numbers — executing the multi-host
code path SURVEY.md §5 requires (ICI intra-slice / DCN across slices is
the same JAX API surface; only the transport differs).
"""

import sys
from functools import partial

import numpy as np


def run_step(n_local_devices: int):
    """One donated UNO_9 train step on an all-data mesh; returns
    (loss, param_checksum) as host floats.

    Deterministic across process topologies: params come from a fixed
    PRNGKey, data from a fixed numpy seed, and the batch is fed through
    ``process_local_batch`` so each process materialises only the rows the
    sharding assigns its devices.
    """
    import jax
    import jax.numpy as jnp

    from uno_tpu.losses import relative_lp_loss
    from uno_tpu.models import build_model
    from uno_tpu.optim import complex_adam, step_lr
    from uno_tpu.parallel.distributed import process_local_batch
    from uno_tpu.parallel.mesh import batch_sharding, make_mesh, replicated
    from uno_tpu.train.state import TrainState, apply_updates

    assert jax.local_device_count() == n_local_devices, jax.local_devices()

    S, BATCH = 64, 8
    model = build_model("uno9", in_width=3, width=8, pad=5)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((BATCH, S, S, 1)).astype(np.float32)
    y = rng.standard_normal((BATCH, S, S)).astype(np.float32)

    mesh = make_mesh()  # every global device on the 'data' axis
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)

    # init runs identically on every process (fixed key); placing the
    # leaves onto the global replicated sharding via callback needs no
    # cross-process data movement.
    params_local = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(x[:1]))
    params = jax.tree.map(
        lambda a: jax.make_array_from_callback(
            a.shape, rep, lambda idx, a=a: np.asarray(a)[idx]
        ),
        jax.device_get(params_local),
    )
    tx = complex_adam(step_lr(1e-3, 10, 0.5, steps_per_epoch=1))
    opt_state = jax.jit(tx.init)(params)
    state = TrainState(params=params, opt_state=opt_state, step=jnp.zeros((), jnp.int32))
    state = jax.tree.map(
        lambda a: a
        if isinstance(a, jax.Array) and not a.is_fully_addressable
        else jax.make_array_from_callback(
            np.shape(a), rep, lambda idx, a=a: np.asarray(jax.device_get(a))[idx]
        ),
        state,
    )

    def loss_fn(p, x, y):
        out = model.apply(p, x).reshape(y.shape)
        return relative_lp_loss(out, y, reduction="sum")

    @partial(jax.jit, donate_argnums=(0,), out_shardings=(None, rep))
    def train_step(state, x, y):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, x, y)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        return (
            TrainState(
                params=apply_updates(state.params, updates),
                opt_state=opt_state,
                step=state.step + 1,
            ),
            loss,
        )

    xb = process_local_batch(bsh, x)
    yb = process_local_batch(bsh, y)
    state, loss = train_step(state, xb, yb)

    def host(a):
        if isinstance(a, jax.Array) and not a.is_fully_addressable:
            a = a.addressable_data(0)
        return np.asarray(a)

    loss_v = float(host(loss))
    checksum = float(
        sum(np.abs(host(l)).sum() for l in jax.tree.leaves(state.params))
    )
    return loss_v, checksum


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)

    from uno_tpu.parallel import initialize_from_env

    ok = initialize_from_env(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert ok, "distributed runtime did not initialize"
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 4 * nproc, jax.devices()

    loss, checksum = run_step(n_local_devices=4)
    print(f"RESULT {pid} {loss!r} {checksum!r}", flush=True)


if __name__ == "__main__":
    main()
