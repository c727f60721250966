"""Same-hardware comparison: the reference's torch train step vs uno_tpu's.

BASELINE.md's A100 denominator is an estimate (no A100 in this environment);
this tool provides a *measured* framework-vs-framework data point instead:
both frameworks run the identical Darcy S=211 headline config
(darcy_flow_main.py:44-117 — UNO_9(3, 32, pad=12), batch 16, LpLoss,
complex-aware Adam with lr 1e-3 / wd 1e-3) on the same host CPU, f32.

torch side = the actual reference code imported from /root/reference
(train_darcy.py:47-56 step semantics).  uno_tpu side = bench.bench_darcy
jitted on the XLA CPU backend.  Same cores, same precision, same math.

Usage:  PALLAS_AXON_POOL_IPS= python tools/cpu_reference_compare.py \
            [--iters 3] [--warmup 1] [--out runs/cpu_compare.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REFERENCE = "/root/reference"


def bench_torch(iters: int, warmup: int) -> float:
    sys.path.insert(0, REFERENCE)
    import torch

    from Adam import Adam  # reference's complex-aware Adam (Adam.py:55)
    from darcy_flow_uno2d import UNO_9
    from utilities3 import LpLoss

    torch.manual_seed(0)
    model = UNO_9(3, 32, pad=12).float()  # darcy_flow_main.py:95
    x = torch.randn(16, 211, 211, 1)
    y = torch.randn(16, 211, 211)
    opt = Adam(model.parameters(), lr=1e-3, weight_decay=1e-3)
    myloss = LpLoss(size_average=False)

    def step():
        opt.zero_grad()
        out = model(x).reshape(16, 211, 211)
        loss = myloss(out.view(16, -1), y.view(16, -1))
        loss.backward()
        opt.step()
        return float(loss)

    for _ in range(warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    return (time.perf_counter() - t0) / iters


def bench_jax(iters: int, warmup: int) -> float:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import bench

    bench.WARMUP = warmup
    res = bench.bench_darcy(iters=iters, tag="cpu_compare")
    return res["ms_per_step"] / 1000.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    torch_s = bench_torch(args.iters, args.warmup)
    print(f"torch (reference): {torch_s*1000:.0f} ms/step", file=sys.stderr)
    jax_s = bench_jax(args.iters, args.warmup)
    print(f"uno_tpu (XLA CPU): {jax_s*1000:.0f} ms/step", file=sys.stderr)

    rec = {
        "config": "darcy_s211_uno9 f32 batch16, same host CPU",
        "n_cores": os.cpu_count(),
        "torch_reference_ms_per_step": round(torch_s * 1000, 1),
        "uno_tpu_xla_cpu_ms_per_step": round(jax_s * 1000, 1),
        "speedup_x": round(torch_s / jax_s, 2),
        "iters": args.iters,
    }
    print(json.dumps(rec))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
