"""Capture a jax.profiler trace of the Darcy S=211 train step and print the
per-op breakdown (tools/trace_ops.py) — the PERF.md measurement loop in one
command.

Usage: python tools/profile_step.py [--width 32] [--dtype bfloat16]
                                    [--iters 8] [--out /tmp/step_trace]

Feeds the MFU / HBM-roofline analysis: run at width 32 (headline) and
128 (width-scaling point) to see which op class stops scaling.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=32)
    ap.add_argument("--dtype", default=None, help="e.g. bfloat16")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--out", default="/tmp/step_trace")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    import jax

    import bench

    # warm up + compile outside the trace, then capture steady-state steps
    res = bench.bench_darcy(width=args.width, iters=3, dtype=args.dtype,
                            tag="warmup")
    print("warmup:", res["ms_per_step"], "ms/step", file=sys.stderr)

    jax.profiler.start_trace(args.out)
    res = bench.bench_darcy(width=args.width, iters=args.iters,
                            dtype=args.dtype, tag="profiled")
    jax.profiler.stop_trace()
    print("profiled:", res["ms_per_step"], "ms/step,",
          res["achieved_tflops"], "TFLOP/s,",
          "mfu", res["mfu_vs_bf16_peak"], file=sys.stderr)

    from trace_ops import load_trace, summarize  # noqa: E402

    summarize(load_trace(args.out), pid=None, top=args.top,
              n_steps=args.iters)


if __name__ == "__main__":
    main()
