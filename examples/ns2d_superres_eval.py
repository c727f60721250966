"""Zero-shot super-resolution evaluation of a trained NS-2D model.

Loads best-val params from a checkpoint dir (e.g. the RESULTS.md quality
run), generates fresh Navier-Stokes trajectories at 2x the training grid
with the same physics, and evaluates the 40-step autoregressive rollout on
them WITHOUT any retraining — the discretization-invariance claim of U-NO
(BASELINE.md "zero-shot super-resolution eval at 2x grid").

    python examples/ns2d_superres_eval.py runs/ns2d_quality [--size 128]
    python examples/ns2d_superres_eval.py runs/ns2d_s256_q \
        --preset ns2d_s256 --size 512 --n 4 --batch 2   # 256^2 -> 512^2
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint_dir")
    ap.add_argument("--preset", default="ns2d",
                    help="preset naming the trained model family")
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--t-in", type=int, default=10)
    ap.add_argument("--t-f", type=int, default=40)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seed", type=int, default=123)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from uno_tpu.data import GaussianRF, default_forcing, navier_stokes_2d
    from uno_tpu.losses import relative_lp_loss
    from uno_tpu.models import build_model
    from uno_tpu.train.checkpoint import CheckpointManager
    from uno_tpu.train.ns2d import make_rollout

    from uno_tpu.configs.presets import get_preset

    preset = get_preset(args.preset)
    model = build_model(preset.model, **preset.model_kwargs)

    # template init at the NEW resolution; weights transplanted from the
    # checkpoint (spectral weights are resolution-independent)
    s = args.size
    tmpl = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, s, s, args.t_in), jnp.float32)
    )
    ckpt = CheckpointManager(args.checkpoint_dir)
    params = ckpt.restore("best_params", tmpl)
    params = jax.tree.map(jnp.asarray, params)

    total_steps = args.t_in + args.t_f
    grf = GaussianRF(2, s, alpha=2.5, tau=7.0)
    f = default_forcing(s)
    rollout = make_rollout(model, args.t_f)

    @jax.jit
    def eval_step(params, xx, yy):
        loss, pred = rollout(params, xx, yy)
        traj = relative_lp_loss(pred, yy, reduction="sum")
        return loss, traj

    key = jax.random.PRNGKey(args.seed)
    step_total = traj_total = count = 0
    done = 0
    while done < args.n:
        key, sub = jax.random.split(key)
        k = min(args.batch, args.n - done)
        w0 = grf.sample(sub, k)
        sol, _ = navier_stokes_2d(
            w0, f, visc=1e-3, T=total_steps * 0.5, delta_t=1e-3,
            record_steps=total_steps,
        )
        xx = sol[..., : args.t_in]
        yy = sol[..., args.t_in : total_steps]
        l, t = eval_step(params, xx, yy)
        step_total += float(l)
        traj_total += float(t)
        count += k
        done += k

    print(
        f"zero-shot @ {s}x{s} (trained at {preset.size}x{preset.size}): "
        f"per-step rel-L2 {step_total / count / args.t_f:.4f}, "
        f"trajectory rel-L2 {traj_total / count:.4f}  (n={count})"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
