"""Summarize a jax.profiler Chrome trace: top device ops by time, op count.

Usage: python tools/trace_ops.py <dir-or-trace.json.gz> [--pid N] [--top K]

Feeds the PERF.md op-count/bandwidth analysis (the Darcy step is op-count
bound; this prints where the time actually goes).  On the session runtime
the device lane is pid 3 (CLAUDE.md); auto-detection falls back to the
pid with the largest total event duration.
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict


def load_trace(path: str) -> dict:
    if os.path.isdir(path):
        hits = sorted(
            glob.glob(os.path.join(path, "**", "*.trace.json.gz"),
                      recursive=True)
            + glob.glob(os.path.join(path, "**", "trace.json.gz"),
                        recursive=True)
        )
        if not hits:
            raise SystemExit(f"no trace.json.gz under {path}")
        path = hits[-1]
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rt") as f:
        return json.load(f)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    pid = None
    top = 25
    for i, a in enumerate(sys.argv[1:], 1):
        if a == "--pid":
            pid = int(sys.argv[i + 1])
        if a == "--top":
            top = int(sys.argv[i + 1])
    data = load_trace(args[0])
    events = [e for e in data.get("traceEvents", []) if e.get("ph") == "X"]
    if pid is None:
        by_pid = defaultdict(float)
        for e in events:
            by_pid[e["pid"]] += e.get("dur", 0)
        pid = max(by_pid, key=by_pid.get)
        print(f"device lane auto-detected: pid {pid} "
              f"({by_pid[pid]/1e3:.1f} ms total)")
    lane = [e for e in events if e["pid"] == pid]
    agg = defaultdict(lambda: [0, 0.0])
    t0 = min(e["ts"] for e in lane)
    t1 = max(e["ts"] + e.get("dur", 0) for e in lane)
    busy = 0.0
    for e in lane:
        agg[e["name"]][0] += 1
        agg[e["name"]][1] += e.get("dur", 0)
        busy += e.get("dur", 0)
    span = t1 - t0
    print(f"events: {len(lane)}  distinct ops: {len(agg)}  "
          f"span: {span/1e3:.2f} ms  busy: {busy/1e3:.2f} ms "
          f"({100*busy/max(span,1):.0f}%)")
    rows = sorted(agg.items(), key=lambda kv: -kv[1][1])[:top]
    width = max(len(n) for n, _ in rows)
    print(f"{'op':<{width}}  {'count':>6}  {'total ms':>9}  {'mean us':>8}")
    for name, (cnt, dur) in rows:
        print(f"{name:<{width}}  {cnt:>6}  {dur/1e3:>9.2f}  "
              f"{dur/max(cnt,1):>8.1f}")


if __name__ == "__main__":
    main()
