"""Round-4 perf experiment battery for the Darcy S=211 headline step.

Runs bench.bench_darcy under candidate configurations and prints a table —
the measurement loop behind PERF.md round 4 (north star: <=11.1 ms/step
bf16 => >=3x the A100 reference estimate).

Usage: python examples/perf_experiments.py [--iters 30] [--exp a,b,...]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--exp", default="base,pad32,fused,pad32_fused")
    args = ap.parse_args()

    exps = {
        "base": dict(dtype="bfloat16"),
        "f32": dict(dtype=None),
        "pad32": dict(dtype="bfloat16", pad_to=32),
        "fused": dict(dtype="bfloat16", fused_adam=True),
        "pad32_fused": dict(dtype="bfloat16", pad_to=32, fused_adam=True),
        "pad32_f32": dict(dtype=None, pad_to=32),
        "resident": dict(dtype="bfloat16", resident=True),
        "resident_pad32": dict(dtype="bfloat16", pad_to=32, resident=True),
        "resident_pad32_fused": dict(
            dtype="bfloat16", pad_to=32, resident=True, fused_adam=True
        ),
    }
    rows = []
    for name in args.exp.split(","):
        kw = exps[name]
        r = bench.bench_darcy(iters=args.iters, tag=f"exp_{name}", **kw)
        rows.append((name, r["ms_per_step"], r["samples_per_sec_per_chip"]))
        print(json.dumps({"exp": name, **{k: r[k] for k in
              ("ms_per_step", "samples_per_sec_per_chip")}}), flush=True)
    print("\nexp            ms/step   samples/s")
    for name, ms, sps in rows:
        print(f"{name:14s} {ms:8.2f} {sps:10.1f}")


if __name__ == "__main__":
    main()
