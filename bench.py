"""Benchmark: training throughput on the reference headline configs.

Default run: the Darcy UNO_9 S=211 batch=16 config (darcy_flow_main.py:44-117)
on whatever accelerator JAX exposes.  Prints ONE JSON line to stdout:

    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

and writes a detail record (per-config ms/step, analytic model FLOPs,
achieved FLOP/s, MFU vs the chip's f32-effective matmul peak) to
``bench_detail.json``.  ``python bench.py --full`` additionally benchmarks
the NS-2D rollout and NS-3D configs into the detail file.

``vs_baseline`` compares samples/sec/chip against A100_REF_SAMPLES_PER_SEC,
an estimate of the PyTorch reference on one A100 for the same config (the
reference publishes no numbers — BASELINE.md; the BASELINE.json north star
asks for >=3x A100 samples/sec/chip, i.e. vs_baseline >= 3).

Timing methodology: the loss of the final step is read back to the host
(``float(loss)``) *inside* the timed region — on the session's relay
runtime ``block_until_ready`` does not synchronize (CLAUDE.md), and the
data-dependent d2h read is the only reliable fence.
"""

import json
import sys
import time
from functools import partial

import numpy as np

# Estimated torch-reference throughput on A100 for Darcy S=211 b=16 fwd+bwd.
# Derivation (documented, not measured — no A100 here): ~45 GFLOP/step
# forward (5 spectral convs dominated by full-res rfft2/irfft2 + 1x1 convs
# at 247^2 x 32..64ch), ~3x for fwd+bwd => ~135 GFLOP/step; torch eager FFT
# + dense einsum achieves ~20-25% of A100's 19.5 TFLOP/s fp32 on this mix
# => ~30-35ms/step => ~480 samples/s.
A100_REF_SAMPLES_PER_SEC = 480.0

# v5e-1 peak: 197 TFLOP/s bf16; f32-accurate (3-pass bf16, precision=HIGH+)
# matmul peak is ~1/3 of that.  MFU below is vs the bf16 peak, the honest
# denominator for "how much of the chip could this step ever use".
TPU_V5E_BF16_PEAK = 197e12

WARMUP = 3
ITERS = 50


def _time_steps(train_step, state, batches, iters):
    """ms/step with the forcing d2h read inside the timed region."""
    t0 = time.perf_counter()
    loss = None
    for i in range(iters):
        x, y = batches[i % len(batches)]
        state, loss = train_step(state, x, y)
    lv = float(loss)  # d2h read = the only reliable fence on this runtime
    dt = time.perf_counter() - t0
    assert np.isfinite(lv), lv
    return dt / iters, state


def _spectral_conv_flops_2d(b, ci, co, h, w_in, d1, d2, m1, m2):
    """Analytic forward FLOPs of one 2D spectral conv on the DFT path
    (real-matmul transforms + Karatsuba contraction), f32-effective."""
    rows = 2 * m1
    fwd_rows = 2 * 2 * rows * h * (b * ci * w_in)        # cos+sin matmuls
    fwd_cols = 4 * 2 * m2 * w_in * (b * ci * rows)       # complex x real pair
    contract = 4 * 2 * (2 * m1 * m2) * b * ci * co       # 2x2-block einsum
    inv_rows = 4 * 2 * d1 * rows * (b * co * m2)
    inv_cols = 2 * 2 * d2 * m2 * (b * co * d1)
    return fwd_rows + fwd_cols + contract + inv_rows + inv_cols


def darcy_model_flops(batch, s, width, pad):
    """Rough analytic fwd FLOPs of UNO_9 at the bench config (spectral convs
    + full-res dense layers; resizes and elementwise excluded)."""
    p = s + 2 * pad
    grids = [p, p // 2, p // 4, p // 4, p // 2, p]
    chans = [width, 2 * width, 4 * width, 4 * width, 2 * width, width]
    modes = [18, 8, 8, 8, 18]
    total = 0.0
    for i in range(5):
        total += _spectral_conv_flops_2d(
            batch, chans[i], chans[i + 1] if i < 4 else width,
            grids[i], grids[i], grids[i + 1], grids[i + 1],
            modes[i], modes[i],
        )
    # lift (3->w/2->w) + projection (2w->w->1) dense at s^2
    total += 2 * batch * s * s * (3 * width // 2 + width // 2 * width)
    total += 2 * batch * s * s * (2 * width * width + width)
    return total


def bench_darcy(width: int = 32, iters: int = ITERS, tag: str = "",
                dtype=None, fused_adam: bool = False, pad_to=None,
                resident: bool = False, batch: int = 16):
    import jax
    import jax.numpy as jnp

    from uno_tpu.losses import relative_lp_loss
    from uno_tpu.models import build_model
    from uno_tpu.optim import complex_adam, step_lr
    from uno_tpu.train.state import TrainState, apply_updates

    BATCH, S, WIDTH, PAD = batch, 211, width, 12
    model = build_model(
        "uno9", in_width=3, width=WIDTH, pad=PAD, dtype=dtype, pad_to=pad_to
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BATCH, S, S, 1)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((BATCH, S, S)), jnp.float32)

    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    tx = complex_adam(
        step_lr(1e-3, 100, 0.5, steps_per_epoch=94), weight_decay=1e-3,
        fused=fused_adam,
    )
    state = TrainState.create(params, tx)

    def loss_fn(p, x, y):
        out = model.apply(p, x).reshape(BATCH, S, S)
        return relative_lp_loss(out, y, reduction="sum")

    @partial(jax.jit, donate_argnums=(0,))
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

    if resident:
        # The trainer's real data path: the dataset lives in HBM and the
        # batch gather happens INSIDE the jitted step, with the dataset
        # donated-and-returned (aliased) — so per call only the index
        # vector crosses the host boundary.  This both matches
        # train/common.py's DataPlacer semantics and avoids this relay's
        # re-streaming of non-donated operands (CLAUDE.md): the plain
        # bench pays ~batch-size h2d per call that neither a real TPU nor
        # the actual training loop pays.
        N_DS = 64
        dsx = jnp.asarray(
            rng.standard_normal((N_DS, S, S, 1)), jnp.float32
        )
        dsy = jnp.asarray(rng.standard_normal((N_DS, S, S)), jnp.float32)

        @partial(jax.jit, donate_argnums=(0, 1, 2))
        def train_step_r(state, dsx, dsy, idx):
            x = jnp.take(dsx, idx, axis=0)
            y = jnp.take(dsy, idx, axis=0)
            loss, grads = jax.value_and_grad(loss_fn)(state.params, x, y)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            return (
                TrainState(
                    params=apply_updates(state.params, updates),
                    opt_state=opt_state,
                    step=state.step + 1,
                ),
                dsx,
                dsy,
                loss,
            )

        idx_rng = np.random.default_rng(1)
        idxs = [
            jnp.asarray(idx_rng.integers(0, N_DS, BATCH), jnp.int32)
            for _ in range(8)
        ]
        for i in range(WARMUP):
            state, dsx, dsy, loss = train_step_r(state, dsx, dsy, idxs[i % 8])
        assert np.isfinite(float(loss)), loss
        t0 = time.perf_counter()
        for i in range(iters):
            state, dsx, dsy, loss = train_step_r(state, dsx, dsy, idxs[i % 8])
        lv = float(loss)  # d2h read = the only reliable fence (CLAUDE.md)
        sec_per_step = (time.perf_counter() - t0) / iters
        assert np.isfinite(lv), lv
    else:
        for _ in range(WARMUP):
            state, loss = train_step(state, x, y)
        assert np.isfinite(float(loss)), loss

        sec_per_step, state = _time_steps(train_step, state, [(x, y)], iters)
    sps = BATCH / sec_per_step
    fwd_flops = darcy_model_flops(BATCH, S, WIDTH, PAD)
    step_flops = 3 * fwd_flops  # fwd + ~2x bwd
    return {
        "config": tag or "darcy_s211_uno9 (darcy_flow_main.py:44-117)",
        "ms_per_step": round(sec_per_step * 1000, 2),
        "samples_per_sec_per_chip": round(sps, 2),
        "model_flops_fwd": fwd_flops,
        "train_step_flops": step_flops,
        "achieved_tflops": round(step_flops / sec_per_step / 1e12, 2),
        "mfu_vs_bf16_peak": round(
            step_flops / sec_per_step / TPU_V5E_BF16_PEAK, 4
        ),
    }


def bench_infer(dtype="bfloat16", batch: int = 16, iters: int = 30,
                tag: str = ""):
    """Serving throughput: forward-only UNO_9 at the Darcy S=211 config.

    The training benches measure fwd+bwd+Adam; deployment serves the
    forward pass alone (cli export / load_forward path).  Measured on the
    jitted apply — the same computation jax.export stages out.  Session
    caveat (recorded in the result): params are non-donated, and this
    runtime's relay re-streams non-donated operands per call, so the
    number includes per-call weight-transfer overhead a real deployment
    with device-resident weights would not pay (CLAUDE.md; ADVICE r3).
    """
    import jax
    import jax.numpy as jnp

    from uno_tpu.models import build_model

    S, WIDTH, PAD = 211, 32, 12
    model = build_model("uno9", in_width=3, width=WIDTH, pad=PAD, dtype=dtype)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, S, S, 1)), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)

    # Each iteration perturbs the input by a function of the previous
    # output, so the final d2h read transitively fences EVERY call — on
    # this runtime independent dispatches could otherwise overlap and
    # under-measure (ADVICE r3; block_until_ready is a relay no-op).
    @jax.jit
    def step(p, x, out):
        x = x + 0.0 * jnp.mean(jnp.asarray(out, jnp.float32))
        return x, model.apply(p, x)

    mean = jax.jit(lambda o: jnp.mean(jnp.asarray(o, jnp.float32)))
    out = jnp.zeros(())
    for _ in range(WARMUP):
        x, out = step(params, x, out)
    assert np.isfinite(float(mean(out)))
    t0 = time.perf_counter()
    for _ in range(iters):
        x, out = step(params, x, out)
    _ = float(mean(out))  # d2h fence (block_until_ready is a relay no-op)
    dt = (time.perf_counter() - t0) / iters
    fwd_flops = darcy_model_flops(batch, S, WIDTH, PAD)
    return {
        "config": tag or f"darcy_s211_uno9_infer_b{batch}_{dtype}",
        "ms_per_batch": round(dt * 1000, 2),
        "samples_per_sec_per_chip": round(batch / dt, 2),
        "achieved_tflops": round(fwd_flops / dt / 1e12, 2),
        "note": "includes per-call relay streaming of non-donated params "
                "(~session overhead); resident-weight serving would be "
                "faster",
    }


def bench_width_scaling(widths=(64, 128)):
    """MFU vs model width at the Darcy S=211 config (w=32 is the headline
    entry).  Separates "the framework is slow" from "this model is small":
    utilization should rise with arithmetic intensity as the channel
    dimension grows (VERDICT r2 weak #1)."""
    out = []
    for w in widths:
        out.append(
            bench_darcy(width=w, iters=20, tag=f"darcy_s211_uno9_w{w}")
        )
        out.append(
            bench_darcy(width=w, iters=20, dtype="bfloat16",
                        tag=f"darcy_s211_uno9_w{w}_bf16")
        )
    return out


def bench_spectral_roofline():
    """Achieved FLOP/s of the partial-DFT transform matmul at high
    arithmetic intensity.

    The reference configs keep m~18 modes, so the transform's intensity is
    ~m FLOP/byte and the whole model rides the HBM roofline — MFU is flat
    in width (bench_detail width-scaling entries; PERF.md round 3).  The
    U-NO contraction cannot raise intensity either: weights are per-mode,
    so weight traffic grows with modes.  What CAN run dense is the
    transform itself: at a large-scale config (512^2 grid, 256 retained
    rows, 128 channels) the row-transform matmul is ~128 FLOP/byte, and
    this bench shows the same ops/dft.py code sustains MXU-class
    throughput there — the "is the framework slow or is the model small"
    separator.  Measured at f32-HIGHEST (6-pass bf16 emulation; its
    *effective* peak is ~197/6 TFLOP/s) and bf16-DEFAULT (full MXU rate).
    """
    import jax
    import jax.numpy as jnp

    from uno_tpu.ops import dft

    out = []
    B, C, S, M1 = 16, 128, 512, 128
    rows = tuple(range(M1)) + tuple(range(S - M1, S))
    flops = 2 * B * C * S * S * (2 * 2 * M1)  # (2 planes) x 2m1 rows

    for tag, prec in (
        (f"dft_row_transform {S}^2 c{C} m{M1} f32-highest", "highest"),
        (f"dft_row_transform {S}^2 c{C} m{M1} bf16-default", "default"),
    ):
        dft.set_precision(prec)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((B, C, S, S)), jnp.float32)

        def step(x):
            y = dft.fwd_real(x, -2, S, rows)      # (B, C, 2, 2*M1, S)
            # fold back to the input shape so the op chains under donation
            return dft.inv_real(
                jnp.swapaxes(y, -1, -2)[..., : S // 2 + 1], -1, S
            )

        f = jax.jit(step, donate_argnums=(0,))
        x = f(x)  # compile + warm
        x = f(x)
        # d2h fence BEFORE timing: dispatch is async on the relay and the
        # server-side compile (~minutes) otherwise lands inside the timed
        # loop (block_until_ready does not synchronize — CLAUDE.md)
        assert np.isfinite(float(jax.jit(jnp.mean)(x)))
        t0 = time.perf_counter()
        n_calls = 10
        for _ in range(n_calls):
            x = f(x)
        _ = float(jax.jit(jnp.mean)(x))  # d2h fence (eager reduce is
        # UNIMPLEMENTED through the relay - CLAUDE.md)
        # two transforms per step (fwd + inv), count the fwd only => the
        # per-transform time is dt/2 with equal-shape transforms
        dt = (time.perf_counter() - t0) / n_calls / 2
        rec = {
            "config": tag,
            "ms_per_transform": round(dt * 1000, 3),
            "achieved_tflops": round(flops / dt / 1e12, 2),
            "mfu_vs_bf16_peak": round(flops / dt / TPU_V5E_BF16_PEAK, 4),
        }
        print("roofline:", rec, flush=True)
        out.append(rec)
    dft.set_precision("highest")
    return out


def bench_ns2d(t_f=40, dtype=None, tag="", iters: int = 20):
    """NS-2D autoregressive rollout train step (ns_uno2d_main.py:26-107)."""
    import jax
    import jax.numpy as jnp

    from uno_tpu.models import build_model
    from uno_tpu.optim import complex_adam, step_lr
    from uno_tpu.train.ns2d import make_rollout
    from uno_tpu.train.state import TrainState, apply_updates

    BATCH, S = 16, 64
    model = build_model("uno", in_width=14, width=32, pad=0, dtype=dtype)
    rng = np.random.default_rng(0)
    xx = jnp.asarray(rng.standard_normal((BATCH, S, S, 10)), jnp.float32)
    yy = jnp.asarray(rng.standard_normal((BATCH, S, S, t_f)), jnp.float32)

    params = jax.jit(model.init)(jax.random.PRNGKey(0), xx)
    tx = complex_adam(
        step_lr(1e-3, 100, 0.5, steps_per_epoch=250), weight_decay=1e-5
    )
    state = TrainState.create(params, tx)
    rollout = make_rollout(model, t_f)

    def loss_fn(p, xx, yy):
        loss, _ = rollout(p, xx, yy)
        return loss

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state, xx, yy):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, xx, yy)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        return (
            TrainState(
                params=apply_updates(state.params, updates),
                opt_state=opt_state,
                step=state.step + 1,
            ),
            loss,
        )

    for _ in range(WARMUP):
        state, loss = train_step(state, xx, yy)
    assert np.isfinite(float(loss)), loss
    sec_per_step, state = _time_steps(train_step, state, [(xx, yy)], iters)
    return {
        "config": tag or f"ns2d_uno_Tf{t_f}_bptt (ns_uno2d_main.py:26-107)",
        "ms_per_step": round(sec_per_step * 1000, 2),
        "samples_per_sec_per_chip": round(BATCH / sec_per_step, 2),
        "model_evals_per_sec": round(BATCH * t_f / sec_per_step, 1),
    }


def bench_ns3d(dtype=None, tag="", iters: int = 20):
    """NS-3D Uno3D_T40 spatiotemporal train step (ns_uno3d_main.py:33-123)."""
    import jax
    import jax.numpy as jnp

    from uno_tpu.losses import relative_lp_loss
    from uno_tpu.models import build_model
    from uno_tpu.optim import complex_adam, step_lr
    from uno_tpu.train.state import TrainState, apply_updates

    BATCH, S, T_IN, T_F = 16, 64, 10, 40
    model = build_model("uno3d_t40", in_width=6, width=8, pad=3, dtype=dtype)
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((BATCH, S, S, T_IN, 1)), jnp.float32
    )
    y = jnp.asarray(rng.standard_normal((BATCH, S, S, T_F)), jnp.float32)

    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    tx = complex_adam(
        step_lr(3e-3, 100, 0.5, steps_per_epoch=563), weight_decay=1e-5
    )
    state = TrainState.create(params, tx)

    def loss_fn(p, x, y):
        out = model.apply(p, x)
        out = out.reshape(y.shape)
        return relative_lp_loss(out, y, reduction="sum")

    @partial(jax.jit, donate_argnums=(0,))
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

    for _ in range(WARMUP):
        state, loss = train_step(state, x, y)
    assert np.isfinite(float(loss)), loss
    sec_per_step, state = _time_steps(train_step, state, [(x, y)], iters)
    return {
        "config": tag or "ns3d_uno3d_t40 (ns_uno3d_main.py:33-123)",
        "ms_per_step": round(sec_per_step * 1000, 2),
        "samples_per_sec_per_chip": round(BATCH / sec_per_step, 2),
    }


def bench_darcy_dp_cpu():
    """Darcy S=85 train step, single CPU device vs an 8-device DP mesh.

    Spawned as a subprocess (the parent's backend is already pinned);
    quantifies the data-parallel scaling + prefetch path on the virtual
    mesh (VERDICT r2 weak #4/#5).  Relative scaling is the meaningful
    number — absolute CPU throughput is not a TPU statement.
    """
    import os
    import subprocess
    import sys as _sys

    env = dict(os.environ)
    env["UNO_TPU_BENCH_CHILD"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    out = subprocess.run(
        [_sys.executable, os.path.abspath(__file__), "--_dp-child"],
        capture_output=True, text=True, env=env, timeout=1200,
    )
    if out.returncode != 0:
        return {"config": "darcy_s85_dp_cpu8", "error": out.stderr[-2000:]}
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def _dp_child() -> None:
    """Child body for bench_darcy_dp_cpu: 1-device vs 8-device DP mesh."""
    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from uno_tpu.losses import relative_lp_loss
    from uno_tpu.models import build_model
    from uno_tpu.optim import complex_adam, step_lr
    from uno_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from uno_tpu.train.state import TrainState, apply_updates

    BATCH, S, WIDTH, PAD = 16, 85, 32, 5
    model = build_model("uno9", in_width=3, width=WIDTH, pad=PAD)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BATCH, S, S, 1)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((BATCH, S, S)), jnp.float32)
    tx = complex_adam(step_lr(1e-3, 100, 0.5, steps_per_epoch=94))

    def loss_fn(p, x, y):
        out = model.apply(p, x).reshape(BATCH, S, S)
        return relative_lp_loss(out, y, reduction="sum")

    def run(mesh, iters=8):
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])
        state = TrainState.create(params, tx)
        if mesh is not None:
            state = replicate(mesh, state)
        xb, yb = (shard_batch(mesh, x, y)) if mesh is not None else (x, y)

        @partial(jax.jit, donate_argnums=(0,))
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

        for _ in range(2):
            state, loss = train_step(state, xb, yb)
        assert np.isfinite(float(loss))
        sec, _ = _time_steps(train_step, state, [(xb, yb)], iters)
        return BATCH / sec

    sps_1 = run(make_mesh(n_data=1, devices=jax.devices()[:1]))
    sps_8 = run(make_mesh(n_data=8))
    print(json.dumps({
        "config": "darcy_s85_dp_cpu8 (8-device virtual DP mesh vs 1 device)",
        "samples_per_sec_1dev": round(sps_1, 2),
        "samples_per_sec_8dev_dp": round(sps_8, 2),
        "dp_scaling_x": round(sps_8 / sps_1, 2),
        "virtual_mesh": True,  # NOT a hardware scaling measurement
        "note": "virtual CPU devices share one host thread pool and the "
                "1-device XLA executable already uses every core, so <1x "
                "quantifies sharding overhead, not scaling (PERF.md); "
                "positive scaling requires real multi-chip hardware",
    }))


def main(full: bool = True) -> None:
    import jax

    detail = {
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "configs": [],
    }
    def _record(cfg):
        detail["configs"].append(cfg)
        with open("bench_detail.json", "w") as f:
            json.dump(detail, f, indent=1)

    # Headline = bf16/f32 mixed precision, the precision the BASELINE.json
    # north star names ("FFT+matmul roofline on TPU in bf16/fp32-mixed") and
    # a quality-verified policy (RESULTS.md round 3: Darcy S=211 bf16 run
    # matches the f32 run's held-out rel-L2), on the trainer's real data
    # path: the dataset lives in HBM and the batch gather happens inside
    # the jitted step (train/common.py DataPlacer semantics), so per step
    # only an index vector crosses the host boundary.  The per-call-h2d
    # variant is recorded alongside — on this session's relay it pays a
    # ~1 ms non-donated 5.7 MB operand stream per call that neither a
    # real TPU input pipeline nor the actual training loop pays.  The f32
    # step is recorded for an apples-to-apples-with-torch view.
    darcy = bench_darcy(dtype="bfloat16", resident=True,
                        tag="darcy_s211_uno9_bf16_mixed_resident")
    _record(darcy)
    # Headline JSON is printed IMMEDIATELY after the headline config so the
    # driver-captured artifact lands even if its timeout cuts the sweep
    # short (BENCH_r04.json was rc=124/parsed=null for exactly this reason
    # — VERDICT r4 #1).  The remaining configs only add detail records.
    sps = darcy["samples_per_sec_per_chip"]
    print(
        json.dumps(
            {
                "metric": "darcy_s211_uno9_train_samples_per_sec_per_chip",
                "value": sps,
                "unit": "samples/sec",
                "vs_baseline": round(sps / A100_REF_SAMPLES_PER_SEC, 3),
            }
        ),
        flush=True,
    )
    _record(bench_darcy(dtype="bfloat16", tag="darcy_s211_uno9_bf16_mixed"))
    _record(bench_darcy(tag="darcy_s211_uno9_f32 (darcy_flow_main.py:44-117)"))
    if full:
        # batch-scaling rows (VERDICT r4 #5): per-chip throughput as the
        # deployment lever a production user would pull — fixed weights
        # traffic amortizes over more samples, so samples/s/chip rises
        # past the reference's batch-16 config.
        _record(bench_darcy(dtype="bfloat16", batch=32,
                            tag="darcy_s211_uno9_bf16_b32"))
        _record(bench_darcy(dtype="bfloat16", batch=64,
                            tag="darcy_s211_uno9_bf16_b64"))
        for cfg in bench_width_scaling():
            _record(cfg)
        for cfg in bench_spectral_roofline():
            _record(cfg)
        _record(bench_ns2d())
        _record(bench_ns2d(dtype="bfloat16", tag="ns2d_uno_Tf40_bptt_bf16"))
        _record(bench_ns3d())
        _record(bench_ns3d(dtype="bfloat16", tag="ns3d_uno3d_t40_bf16"))
        _record(bench_infer())
        _record(bench_infer(batch=64, tag="darcy_s211_uno9_infer_b64_bfloat16"))
        _record(bench_darcy_dp_cpu())


# Perf regression guard (VERDICT r2 #8, widened to every family per
# VERDICT r3 #8): pinned round-4 step times on the session TPU v5e, with
# a generous band for relay jitter.  A refactor that silently loses the
# partial-DFT, bf16, custom-VJP or fused-head wins trips this (FFT-path
# regression would be ~2x; the round-2 bf16 conversion bug was ~1.7x).
GUARD_LIMITS_MS = {
    # name: (bench thunk, pinned round-4 ms/step)
    "darcy_bf16": (lambda: bench_darcy(dtype="bfloat16", iters=20,
                                       tag="guard_darcy_bf16"), 13.3),
    "darcy_f32": (lambda: bench_darcy(iters=20, tag="guard_darcy_f32"), 23.3),
    "ns2d_bf16": (lambda: bench_ns2d(dtype="bfloat16", iters=6,
                                     tag="guard_ns2d_bf16"), 212.0),
    "ns3d_bf16": (lambda: bench_ns3d(dtype="bfloat16", iters=6,
                                     tag="guard_ns3d_bf16"), 134.0),
}
GUARD_BAND = 1.30


def guard() -> int:
    """Run the pinned configs across every family and fail on step-time
    regression (band = pinned * 1.30 for relay jitter)."""
    import jax

    if jax.default_backend() not in ("tpu", "axon"):
        print("guard: requires the TPU backend, got", jax.default_backend())
        return 2
    rc = 0
    for name, (thunk, pinned) in GUARD_LIMITS_MS.items():
        r = thunk()
        limit = pinned * GUARD_BAND
        ok = r["ms_per_step"] <= limit
        print(json.dumps({
            "guard": name,
            "ms_per_step": r["ms_per_step"],
            "limit_ms": round(limit, 1),
            "ok": ok,
        }))
        rc |= 0 if ok else 1
    return rc


if __name__ == "__main__":
    if "--_dp-child" in sys.argv[1:]:
        _dp_child()
    elif "--guard" in sys.argv[1:]:
        sys.exit(guard())
    else:
        # Default is now the FAST suite (headline + the two darcy detail
        # rows): the round-4 driver bench timed out mid-sweep and its
        # canonical artifact was rc=124/parsed=null (VERDICT r4 #1).  The
        # full 15-config sweep (every family, VERDICT r2 weak #2) runs with
        # --full and is executed + committed to bench_detail.json each
        # round by the builder chain instead of the driver's timed slot.
        main(full="--full" in sys.argv[1:])
