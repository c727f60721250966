"""Same-hardware comparison: the reference's torch train steps vs uno_tpu's.

BASELINE.md's A100 denominator is an estimate (no A100 in this environment);
this tool provides *measured* framework-vs-framework data points instead:
both frameworks run identical configs on the same host CPU, f32:

* ``darcy`` — Darcy S=211 headline (darcy_flow_main.py:44-117 — UNO_9(3, 32,
  pad=12), batch 16, LpLoss, complex-aware Adam lr 1e-3 / wd 1e-3).
* ``ns2d``  — the 40-step autoregressive BPTT rollout step
  (ns_train_2d.py:42-68 — UNO(14, 32), batch 16, S=64, single backward
  through the whole rollout).
* ``ns3d``  — the Uno3D_T40 spatiotemporal step (ns_train_3d.py:48-67 —
  Uno3D_T40(6, 8, pad=3), batch 16, S=64, 10→40 steps, incl. the
  reference's in-step no_grad per-timestep logging loop, as written).

torch side = the actual reference code imported from /root/reference.
uno_tpu side = bench.bench_{darcy,ns2d,ns3d} jitted on the XLA CPU backend.
Same cores, same precision, same math.

Usage:  PALLAS_AXON_POOL_IPS= python tools/cpu_reference_compare.py \
            [--configs darcy,ns2d,ns3d] [--out runs/cpu_compare.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REFERENCE = "/root/reference"


def _timed(step, iters, warmup):
    for _ in range(warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    return (time.perf_counter() - t0) / iters


def bench_torch_darcy(iters: int, warmup: int) -> float:
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

    return _timed(step, iters, warmup)


def bench_torch_ns2d(iters: int, warmup: int) -> float:
    """Reference NS-2D rollout step, exactly as ns_train_2d.py:42-68 writes
    it (40 sequential model calls, running pred concat, one backward)."""
    sys.path.insert(0, REFERENCE)
    import torch

    from Adam import Adam
    from navier_stokes_uno2d import UNO
    from utilities3 import LpLoss

    torch.manual_seed(0)
    model = UNO(14, 32).float()  # ns_uno2d_main.py:89
    xx0 = torch.randn(16, 64, 64, 10)
    yy = torch.randn(16, 64, 64, 40)
    opt = Adam(model.parameters(), lr=1e-3, weight_decay=1e-5)
    myloss = LpLoss(size_average=False)

    def step():
        opt.zero_grad()
        xx = xx0
        loss = 0
        pred = None
        for t in range(0, 40, 1):  # ns_train_2d.py:52
            y = yy[..., t : t + 1]
            im = model(xx)
            loss += myloss(im.reshape(16, -1), y.reshape(16, -1))
            pred = im if t == 0 else torch.cat((pred, im), -1)
            xx = torch.cat((xx[..., 1:], im), dim=-1)
        loss.backward()  # BPTT through all 40 calls (ns_train_2d.py:67)
        opt.step()
        return float(loss)

    return _timed(step, iters, warmup)


def bench_torch_ns3d(iters: int, warmup: int) -> float:
    """Reference NS-3D step as ns_train_3d.py:48-67 writes it (full-field
    backward + the in-step no_grad per-timestep logging loop)."""
    sys.path.insert(0, REFERENCE)
    import torch

    from Adam import Adam
    from navier_stokes_uno3d import Uno3D_T40
    from utilities3 import LpLoss

    torch.manual_seed(0)
    model = Uno3D_T40(6, 8, pad=3).float()  # ns_uno3d_main.py:104
    x = torch.randn(16, 64, 64, 10, 1)
    y = torch.randn(16, 64, 64, 40)
    opt = Adam(model.parameters(), lr=3e-3, weight_decay=1e-5)
    myloss = LpLoss(size_average=False)

    def step():
        opt.zero_grad()
        out = model(x).view(16, 64, 64, 40)
        with torch.no_grad():  # ns_train_3d.py:56-62
            tsl = 0
            for t in range(40):
                tsl += myloss(
                    out[..., t].reshape(16, -1), y[..., t].reshape(16, -1)
                )
            float(tsl)
        l2 = myloss(out.view(16, -1), y.view(16, -1))
        l2.backward()
        opt.step()
        return float(l2)

    return _timed(step, iters, warmup)


def bench_jax(config: str, iters: int, warmup: int) -> float:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import bench

    bench.WARMUP = warmup
    if config == "darcy":
        res = bench.bench_darcy(iters=iters, tag="cpu_compare_darcy")
    elif config == "ns2d":
        res = bench.bench_ns2d(iters=iters, tag="cpu_compare_ns2d")
    else:
        res = bench.bench_ns3d(iters=iters, tag="cpu_compare_ns3d")
    return res["ms_per_step"] / 1000.0


TORCH_BENCHES = {
    "darcy": (bench_torch_darcy, "darcy_s211_uno9 f32 batch16"),
    "ns2d": (bench_torch_ns2d, "ns2d_uno_Tf40_bptt f32 batch16 S=64"),
    "ns3d": (bench_torch_ns3d, "ns3d_uno3d_t40 f32 batch16 S=64"),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="darcy,ns2d,ns3d")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    records = []
    for cfg in args.configs.split(","):
        fn, desc = TORCH_BENCHES[cfg]
        torch_s = fn(args.iters, args.warmup)
        print(f"[{cfg}] torch (reference): {torch_s*1000:.0f} ms/step",
              file=sys.stderr)
        jax_s = bench_jax(cfg, args.iters, args.warmup)
        print(f"[{cfg}] uno_tpu (XLA CPU): {jax_s*1000:.0f} ms/step",
              file=sys.stderr)
        records.append({
            "config": f"{desc}, same host CPU",
            "n_cores": os.cpu_count(),
            "torch_reference_ms_per_step": round(torch_s * 1000, 1),
            "uno_tpu_xla_cpu_ms_per_step": round(jax_s * 1000, 1),
            "speedup_x": round(torch_s / jax_s, 2),
            "iters": args.iters,
        })

    out = records[0] if len(records) == 1 else {"configs": records}
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
