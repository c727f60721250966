"""Command-line driver.

Replaces the reference's three hardcoded entry scripts (darcy_flow_main.py,
ns_uno2d_main.py, ns_uno3d_main.py) with one CLI over named presets:

    python -m uno_tpu.cli train --preset darcy_s85 --data darcy.mat
    python -m uno_tpu.cli train --preset ns2d --generate --ntrain 64 --epochs 2
    python -m uno_tpu.cli eval --preset ns2d --generate --checkpoint-dir ck
    python -m uno_tpu.cli generate --task ns2d --out ns_data.mat
    python -m uno_tpu.cli bench

``--generate`` synthesizes data on the fly with the JAX generators (GRF +
pseudo-spectral NS solver / Darcy FD solver), so the framework is
self-sufficient without the reference's MATLAB/download pipeline.
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import numpy as np


def _add_train_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--preset", required=True)
    p.add_argument(
        "--data", default=None, nargs="+",
        help=".mat file path(s); multiple Darcy files are pooled and "
             "shuffled into ntrain/nval/ntest as in darcy_flow_main.py:37-93",
    )
    p.add_argument("--generate", action="store_true", help="synthesize data in JAX")
    p.add_argument(
        "--data-cache", default=None,
        help="npz path: generated data is saved here once and reloaded on "
             "subsequent (e.g. resumed) runs instead of being regenerated",
    )
    p.add_argument("--gen-dt", type=float, default=None,
                   help="NS generation solver step (default 1e-3 fast "
                        "profile; the reference generator uses 1e-4, "
                        "ns_datagen.py:144-223)")
    p.add_argument("--gen-T", type=float, default=None,
                   help="NS generation horizon in time units (default "
                        "(t_in+t_f)*0.5; the reference uses 50)")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--learning-rate", type=float, default=None)
    p.add_argument("--weight-decay", type=float, default=None)
    p.add_argument("--ntrain", type=int, default=None)
    p.add_argument("--nval", type=int, default=None)
    p.add_argument("--ntest", type=int, default=None)
    p.add_argument("--size", type=int, default=None)
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--checkpoint-every", type=int, default=1,
                   help="epochs between full-state checkpoints (with "
                        "--checkpoint-dir); best-val params always saved")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--dtype", default=None, choices=["float32", "bfloat16"],
                   help="model compute dtype (mixed-precision policy: "
                        "params/optimizer/loss stay f32; activations and "
                        "matmuls run in bf16 at the native MXU rate — "
                        "~1.6x step-time win on TPU, see PERF.md round 3)")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard the batch over all local devices")
    p.add_argument("--spatial", type=int, default=1,
                   help="shard the leading grid axis over this many devices "
                        "(domain decomposition; combined with --data-parallel "
                        "the mesh is data x spatial)")
    p.add_argument("--tensor-parallel", type=int, default=1, metavar="N",
                   help="channel tensor-parallelism: shard every weight's "
                        "out-channel axis over N devices (parallel/tp.py; "
                        "mutually exclusive with --spatial — both use the "
                        "'spatial' mesh axis)")
    p.add_argument("--platform", default=None,
                   help="force a JAX platform (e.g. 'cpu'); needed on "
                        "runtimes whose sitecustomize pins a backend")
    p.add_argument("--cpu-devices", type=int, default=None,
                   help="with --platform cpu: number of virtual devices "
                        "(for testing data-parallel/spatial meshes)")
    p.add_argument("--log", default=None,
                   help="append metric JSONL to this file (also printed "
                        "to stdout)")
    p.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler trace of the first epochs")
    p.add_argument("--tensorboard", default=None)
    _add_cache_arg(p)


def _add_cache_arg(p: argparse.ArgumentParser) -> None:
    p.add_argument(
        "--compile-cache", default=".jax_cache", metavar="DIR",
        help="persistent XLA compilation cache directory ('none' to "
             "disable).  Compiled executables are reused across runs, "
             "cutting multi-leg resume / re-run startup from minutes to "
             "seconds (works through the remote-compile relay too)",
    )


def _setup_compile_cache(path) -> None:
    if not path or str(path).lower() == "none":
        return
    import jax

    jax.config.update("jax_compilation_cache_dir", str(path))
    # default threshold skips sub-second compiles; everything here that
    # matters (train step, solver scan) is multi-second
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _build_cfg(preset, args):
    over = {}
    for k in ("epochs", "batch_size", "learning_rate", "weight_decay", "seed"):
        v = getattr(args, k)
        if v is not None:
            over[k] = v
    if args.checkpoint_dir:
        over["checkpoint_dir"] = args.checkpoint_dir
        over["checkpoint_every"] = args.checkpoint_every
    if args.resume:
        over["resume"] = True
    if getattr(args, "tensor_parallel", 1) > 1:
        over["tensor_parallel"] = True
    if args.tensorboard:
        over["log_tensorboard"] = args.tensorboard
    cfg = dataclasses.replace(preset.train, **over)
    data_over = {}
    for k in ("ntrain", "nval", "ntest", "size"):
        v = getattr(args, k)
        if v is not None:
            data_over[k] = v
    preset = dataclasses.replace(preset, train=cfg, **data_over)
    return preset


def _gen_darcy(preset, seed=0):
    import jax

    from uno_tpu.data import generate_darcy_batch

    s = int((421 - 1) / preset.sub) + 1
    n = preset.ntrain + preset.nval + preset.ntest
    a_list, p_list = [], []
    key = jax.random.PRNGKey(seed)
    bs = max(1, min(64, n))
    done = 0
    while done < n:
        key, sub = jax.random.split(key)
        k = min(bs, n - done)
        a, p = generate_darcy_batch(sub, k, s)
        a_list.append(np.asarray(a))
        p_list.append(np.asarray(p))
        done += k
    a = np.concatenate(a_list)[..., None]
    p = np.concatenate(p_list)
    i1 = preset.ntrain
    i2 = i1 + preset.nval
    return (a[:i1], p[:i1], a[i1:i2], p[i1:i2], a[i2:], p[i2:])


def _gen_ns(preset, seed=0, T=None, visc=1e-3, delta_t=None):
    """Generate NS trajectories for a preset's split.

    Integration profile: the reference generator (ns_datagen.py:144-223)
    uses ``delta_t=1e-4, T=50`` with 50 recorded snapshots (1.0 time units
    between snapshots).  The default here is the **fast profile**
    ``delta_t=1e-3, T=(t_in+t_f)*0.5`` (0.5 time units between snapshots) —
    10x fewer solver steps; see examples/gen_profile_compare.py and
    RESULTS.md for a measured spectrum/energy comparison of the two
    profiles.  Pass ``--gen-dt 1e-4 --gen-T 50`` on the CLI for the exact
    reference profile.
    """
    import jax

    from uno_tpu.data import GaussianRF, default_forcing, navier_stokes_2d

    s = preset.size
    n = preset.ntrain + preset.nval + preset.ntest
    total_steps = preset.t_in + preset.t_f
    grf = GaussianRF(2, s, alpha=2.5, tau=7.0)
    f = default_forcing(s)
    a_list, u_list = [], []
    key = jax.random.PRNGKey(seed)
    bs = 20
    done = 0
    while done < n:
        key, sub = jax.random.split(key)
        k = min(bs, n - done)
        w0 = grf.sample(sub, k)
        sol, _ = navier_stokes_2d(
            w0, f, visc=visc, T=T if T is not None else (total_steps * 0.5),
            delta_t=delta_t if delta_t is not None else 1e-3,
            record_steps=total_steps,
        )
        sol = np.asarray(sol)
        a_list.append(sol[..., : preset.t_in])
        u_list.append(sol[..., preset.t_in : preset.t_in + preset.t_f])
        done += k
    a = np.concatenate(a_list)
    u = np.concatenate(u_list)
    i1, i2 = preset.ntrain, preset.ntrain + preset.nval
    return (a[:i1], u[:i1], a[i1:i2], u[i1:i2], a[i2:], u[i2:])


_SPLIT_KEYS = ("train_a", "train_u", "val_a", "val_u", "test_a", "test_u")


def _cached(path, gen_fn, sig=None):
    """Load the 6-array split from ``path`` if present, else generate+save.

    ``sig`` is the generating configuration (preset/split/physics) baked
    into the npz; a cache whose signature differs from the current config
    raises instead of silently overriding the preset (ADVICE r2).  Caches
    written before signatures existed load with a warning.
    """
    import os

    if path and os.path.exists(path):
        z = np.load(path)
        if sig is not None:
            stored = str(z["config_sig"]) if "config_sig" in z else None
            if stored is None:
                print(
                    f"warning: data cache {path} predates config signatures; "
                    f"assuming it matches {sig!r}"
                )
            elif stored != sig:
                raise SystemExit(
                    f"data cache {path} was generated with a different "
                    f"config:\n  cache:   {stored}\n  current: {sig}\n"
                    "delete the cache or point --data-cache elsewhere"
                )
        return tuple(z[k] for k in _SPLIT_KEYS)
    data = gen_fn()
    if path:
        extra = {"config_sig": np.asarray(sig)} if sig is not None else {}
        np.savez(path, **dict(zip(_SPLIT_KEYS, data)), **extra)
    return data


class _Tee:
    """Write metric JSONL to both stdout and an append-mode file."""

    def __init__(self, path):
        import sys

        self._file = open(path, "a")
        self._out = sys.stdout

    def write(self, s):
        self._file.write(s)
        self._out.write(s)

    def flush(self):
        self._file.flush()
        self._out.flush()


def _gen_sig(preset, args) -> str:
    """Configuration signature for the generated-data cache."""
    # darcy sizes via sub (421-grid subsampling); NS tasks via size
    dim = (
        f"sub={preset.sub}" if preset.task == "darcy"
        else f"size={preset.size}"
    )
    parts = [
        f"task={preset.task}", dim,
        f"ntrain={preset.ntrain}", f"nval={preset.nval}",
        f"ntest={preset.ntest}", f"seed={preset.train.seed}",
    ]
    if preset.task in ("ns2d", "ns3d"):
        total = preset.t_in + preset.t_f
        dt = args.gen_dt if args.gen_dt is not None else 1e-3
        T = args.gen_T if args.gen_T is not None else total * 0.5
        parts += [
            f"t_in={preset.t_in}", f"t_f={preset.t_f}",
            f"dt={dt:g}", f"T={T:g}",
        ]
    return ",".join(parts)


def _load_task_data(preset, args):
    """Resolve the preset's 6-array split (train/val/test x input/target)
    from --data / --generate / --data-cache, identically for train and
    eval so an eval sees exactly the splits the training run saw."""
    if preset.task == "darcy":
        if args.generate or not args.data:
            return _cached(
                args.data_cache,
                lambda: _gen_darcy(preset, seed=preset.train.seed),
                sig=_gen_sig(preset, args),
            )
        if len(args.data) > 1:
            from uno_tpu.data import load_darcy_multi

            return load_darcy_multi(
                args.data, preset.ntrain, preset.nval, preset.ntest,
                sub=preset.sub, seed=preset.train.seed,
            )
        from uno_tpu.data import load_darcy

        xt, yt, xs_, ys_ = load_darcy(
            preset.sub, preset.ntrain + preset.nval, preset.ntest,
            args.data[0],
        )
        i1 = preset.ntrain
        return (xt[:i1], yt[:i1], xt[i1:], yt[i1:], xs_, ys_)
    if preset.task in ("ns2d", "ns3d"):
        if args.generate or not args.data:
            return _cached(
                args.data_cache,
                lambda: _gen_ns(
                    preset, seed=preset.train.seed,
                    T=args.gen_T, delta_t=args.gen_dt,
                ),
                sig=_gen_sig(preset, args),
            )
        from uno_tpu.data import load_navier_stokes

        ta, tu, sa, su = load_navier_stokes(
            args.data[0],
            train=preset.ntrain + preset.nval,
            test=preset.ntest,
            sample_num=preset.ntrain + preset.nval + preset.ntest,
            t_in=preset.t_in,
            t_out=preset.t_f,
            size=preset.size,
        )
        i1 = preset.ntrain
        return (ta[:i1], tu[:i1], ta[i1:], tu[i1:], sa, su)
    raise ValueError(preset.task)


def cmd_train(args) -> int:
    import jax

    from uno_tpu.configs.presets import get_preset
    from uno_tpu.models import build_model
    from uno_tpu.parallel import initialize_from_env, make_mesh
    from uno_tpu.train import MetricLogger, train_darcy, train_ns2d, train_ns3d

    if args.platform:
        # must run before any backend use; env vars are too late when a
        # sitecustomize already pinned a platform (CLAUDE.md)
        jax.config.update("jax_platforms", args.platform)
        if args.cpu_devices:
            jax.config.update("jax_num_cpu_devices", args.cpu_devices)
    # multi-host: wire jax.distributed when the env asks for it (no-op
    # single-host); must happen before any backend/mesh use
    initialize_from_env()
    preset = _build_cfg(get_preset(args.preset), args)
    if args.tensor_parallel > 1 and args.spatial > 1:
        raise SystemExit(
            "--tensor-parallel and --spatial are mutually exclusive: both "
            "place work on the 'spatial' mesh axis (weights vs grid)"
        )
    if args.spatial > 1 or args.tensor_parallel > 1:
        # the Pallas fused projection head is a custom call GSPMD cannot
        # partition over the spatial axes (grid- OR weight-sharded) — fall
        # back to the Dense path (ops/pallas/mlp_head.py)
        from uno_tpu.ops.pallas.mlp_head import set_fused_head_mode

        set_fused_head_mode(False)
    if args.tensor_parallel > 1:
        # weight-sharded partitioning feeds XLA CPU's fft thunk layouts it
        # rejects (RET_CHECK IsMonotonicWithDim0Major) — run the spectral
        # transforms as partial-DFT matmuls on every backend under TP
        # (already the TPU default; tests/test_tensor_parallel.py)
        from uno_tpu.ops.spectral import set_dft_mode

        set_dft_mode(True)
    model = build_model(
        preset.model, dtype=args.dtype, **preset.model_kwargs
    )
    n_model = max(args.spatial, args.tensor_parallel)
    mesh = (
        make_mesh(
            n_data=None if args.data_parallel else 1,
            n_spatial=n_model,
        )
        if (args.data_parallel or n_model > 1)
        else None
    )
    logger = MetricLogger(
        stream=_Tee(args.log) if args.log else None,
        tensorboard_dir=preset.train.log_tensorboard,
    )

    if args.profile_dir:
        jax.profiler.start_trace(args.profile_dir)

    try:
        data = _load_task_data(preset, args)
        if preset.task == "darcy":
            train_darcy(model, *data, preset.train, mesh=mesh, logger=logger)
        elif preset.task == "ns2d":
            train_ns2d(
                model, *data, preset.train, t_f=preset.t_f, mesh=mesh, logger=logger
            )
        else:
            train_ns3d(
                model, *data, preset.train, t_f=preset.t_f, mesh=mesh, logger=logger
            )
    finally:
        if args.profile_dir:
            jax.profiler.stop_trace()
    return 0


def _checkpoint_setup(args):
    """Shared eval/predict/export plumbing: platform config, preset/model
    build, and best-params restore (template-driven so complex leaves
    decode through the (re, im)-safe path)."""
    import jax

    from uno_tpu.configs.presets import get_preset
    from uno_tpu.models import build_model

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
        if args.cpu_devices:
            jax.config.update("jax_num_cpu_devices", args.cpu_devices)
    if not args.checkpoint_dir:
        raise SystemExit(f"{args.cmd} requires --checkpoint-dir")
    preset = _build_cfg(get_preset(args.preset), args)
    model = build_model(preset.model, dtype=args.dtype, **preset.model_kwargs)
    return preset, model


def _restore_best_params(args, preset, model, sample):
    import jax
    import jax.numpy as jnp

    from uno_tpu.train.checkpoint import CheckpointManager

    sample = jnp.asarray(sample)
    if preset.task == "ns3d" and sample.ndim == 4:
        sample = sample[..., None]
    template = jax.jit(model.init)(jax.random.PRNGKey(preset.train.seed), sample)
    ckpt = CheckpointManager(args.checkpoint_dir)
    if not ckpt.exists("best_params"):
        raise SystemExit(
            f"no best_params checkpoint under {args.checkpoint_dir} — "
            "was the run trained with --checkpoint-dir and at least one "
            "validation pass?"
        )
    return ckpt.restore("best_params", template)


def cmd_eval(args) -> int:
    """Evaluate a trained checkpoint's best-val params on the preset's
    val and test splits (the reference only evaluates inside training,
    train_darcy.py:86-100; a standalone eval is net-new surface)."""
    import json

    from uno_tpu.train.evaluate import (
        evaluate_darcy,
        evaluate_ns2d,
        evaluate_ns3d,
    )

    preset, model = _checkpoint_setup(args)
    data = _load_task_data(preset, args)
    _, _, val_a, val_u, test_a, test_u = data
    params = _restore_best_params(args, preset, model, data[0][:1])

    bs = preset.train.batch_size
    out = {"task": preset.task, "preset": preset.name,
           "checkpoint": args.checkpoint_dir}
    for split, a, u in (("val", val_a, val_u), ("test", test_a, test_u)):
        if not len(a):
            continue
        if preset.task == "darcy":
            out[f"{split}_rel_l2"] = evaluate_darcy(model, params, a, u, bs)
        elif preset.task == "ns2d":
            r = evaluate_ns2d(model, params, a, u, preset.t_f, bs)
            out[f"{split}_step_rel_l2"] = r["step_rel_l2"]
            out[f"{split}_traj_rel_l2"] = r["traj_rel_l2"]
        else:
            r = evaluate_ns3d(model, params, a, u, preset.t_f, bs)
            out[f"{split}_field_rel_l2"] = r["field_rel_l2"]
            out[f"{split}_step_rel_l2"] = r["step_rel_l2"]
    line = json.dumps(out)
    print(line)
    if args.log:
        with open(args.log, "a") as f:
            f.write(line + "\n")
    return 0


def cmd_predict(args) -> int:
    """Batch inference: run a trained checkpoint over a split's inputs and
    write (input, pred, target) arrays to an npz — the serving-style
    counterpart of ``eval`` (which only reports metrics)."""
    import jax
    import jax.numpy as jnp

    preset, model = _checkpoint_setup(args)
    data = _load_task_data(preset, args)
    split = {"train": 0, "val": 2, "test": 4}[args.split]
    a, u = data[split], data[split + 1]
    params = _restore_best_params(args, preset, model, data[0][:1])

    if preset.task == "darcy":
        s = u.shape[1]
        fwd = jax.jit(
            lambda p, xb: model.apply(p, xb).reshape(xb.shape[0], s, s)
        )
    elif preset.task == "ns2d":
        from uno_tpu.train.ns2d import make_rollout

        rollout = make_rollout(model, preset.t_f)

        def fwd(p, xb):
            # rollout needs targets only for the loss; feed zeros
            _, pred = rollout(p, xb, jnp.zeros(xb.shape[:3] + (preset.t_f,)))
            return pred

        fwd = jax.jit(fwd)
    else:
        s = u.shape[1]
        fwd = jax.jit(
            lambda p, xb: model.apply(p, xb[..., None]).reshape(
                xb.shape[0], s, s, preset.t_f
            )
        )

    bs = preset.train.batch_size
    preds = [
        np.asarray(fwd(params, jnp.asarray(a[i : i + bs])))
        for i in range(0, len(a), bs)
    ]
    pred = np.concatenate(preds) if preds else np.zeros((0,))
    np.savez(args.out, input=a, pred=pred, target=u)
    print(f"wrote {args.out}: pred {pred.shape} ({args.split} split)")
    return 0


def cmd_export(args) -> int:
    """AOT-export a trained checkpoint's forward pass as a self-contained
    StableHLO serving artifact (uno_tpu/export.py)."""
    import jax.numpy as jnp

    from uno_tpu.export import export_forward

    preset, model = _checkpoint_setup(args)
    s = args.size or preset.size
    if preset.task == "darcy":
        s = int((421 - 1) / preset.sub) + 1 if args.size is None else s
        sample = jnp.zeros((args.serve_batch, s, s, 1), jnp.float32)
    elif preset.task == "ns2d":
        sample = jnp.zeros((args.serve_batch, s, s, preset.t_in), jnp.float32)
    else:
        sample = jnp.zeros(
            (args.serve_batch, s, s, preset.t_in, 1), jnp.float32
        )
    params = _restore_best_params(args, preset, model, sample)

    data = export_forward(
        model, params, sample, path=args.out,
        platforms=args.platforms.split(",") if args.platforms else None,
    )
    print(
        f"wrote {args.out}: {len(data)/1e6:.1f} MB StableHLO artifact for "
        f"input {tuple(sample.shape)}"
        + (f" platforms={args.platforms}" if args.platforms else "")
    )
    return 0


def cmd_generate(args) -> int:
    import jax
    import scipy.io

    from uno_tpu.data import (
        GaussianRF,
        default_forcing,
        generate_darcy_batch,
        navier_stokes_2d,
    )

    if args.task == "darcy":
        s = args.size or 421
        a, p = generate_darcy_batch(jax.random.PRNGKey(args.seed), args.n, s)
        scipy.io.savemat(args.out, {"coeff": np.asarray(a), "sol": np.asarray(p)})
    else:
        s = args.size or 64
        grf = GaussianRF(2, s, alpha=2.5, tau=7.0)
        f = default_forcing(s)
        bs = 20
        mdict = {}
        key = jax.random.PRNGKey(args.seed)
        for i in range(-(-args.n // bs)):
            key, sub = jax.random.split(key)
            w0 = grf.sample(sub, min(bs, args.n - i * bs))
            sol, sol_t = navier_stokes_2d(
                w0, f, visc=args.visc, T=args.T, delta_t=args.delta_t,
                record_steps=args.record_steps,
            )
            mdict[f"a{i}"] = np.asarray(w0)
            mdict[f"u{i}"] = np.asarray(sol)
            mdict[f"t{i}"] = np.asarray(sol_t)
        scipy.io.savemat(args.out, mdict, do_compression=True)
    print(f"wrote {args.out}")
    return 0


def cmd_bench(args) -> int:
    import bench

    bench.main()
    return 0


def main(argv=None) -> int:
    # The session relay intermittently wedges a device call (d2h most often);
    # the hang is silent — no exception, no log line.  Register SIGUSR1 to
    # dump every thread's Python stack to stderr so run watchdogs can
    # attribute a stall (kill -USR1 <pid>) before escalating to TERM.
    import faulthandler
    import signal

    faulthandler.enable()
    if hasattr(signal, "SIGUSR1"):
        faulthandler.register(signal.SIGUSR1, all_threads=True)

    parser = argparse.ArgumentParser(prog="uno_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_train = sub.add_parser("train")
    _add_train_args(p_train)
    p_train.set_defaults(fn=cmd_train)

    p_eval = sub.add_parser("eval")
    _add_train_args(p_eval)  # same preset/data/platform surface as train
    p_eval.set_defaults(fn=cmd_eval)

    p_pred = sub.add_parser("predict")
    _add_train_args(p_pred)
    p_pred.add_argument("--out", required=True, help="output npz path")
    p_pred.add_argument("--split", default="test",
                        choices=["train", "val", "test"])
    p_pred.set_defaults(fn=cmd_predict)

    p_exp = sub.add_parser("export")
    _add_train_args(p_exp)
    p_exp.add_argument("--out", required=True, help="artifact output path")
    p_exp.add_argument("--serve-batch", type=int, default=1,
                       help="batch size baked into the serving artifact")
    p_exp.add_argument("--platforms", default=None,
                       help="comma-separated lowering targets (e.g. "
                            "'tpu,cpu'); default = exporting host's")
    p_exp.set_defaults(fn=cmd_export)

    p_gen = sub.add_parser("generate")
    p_gen.add_argument("--task", choices=["darcy", "ns"], required=True)
    p_gen.add_argument("--out", required=True)
    p_gen.add_argument("--n", type=int, default=100)
    p_gen.add_argument("--size", type=int, default=None)
    p_gen.add_argument("--seed", type=int, default=0)
    p_gen.add_argument("--visc", type=float, default=1e-3)
    p_gen.add_argument("--T", type=float, default=50.0)
    p_gen.add_argument("--delta-t", type=float, default=1e-4)
    p_gen.add_argument("--record-steps", type=int, default=50)
    _add_cache_arg(p_gen)
    p_gen.set_defaults(fn=cmd_generate)

    p_bench = sub.add_parser("bench")
    _add_cache_arg(p_bench)
    p_bench.set_defaults(fn=cmd_bench)

    args = parser.parse_args(argv)
    _setup_compile_cache(getattr(args, "compile_cache", None))
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
