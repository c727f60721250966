"""Aggregate a jax.profiler device trace by source line / HLO category.

Usage: python tools/trace_attrib.py <trace-dir> [--steps N] [--top K]
                                    [--by source|category|tfop]

Prints per-step ms and bytes for each group — the PERF.md attribution
loop (which op class / source line owns the step time) in one command.
Device lane is auto-detected as the pid named '/device:*' (pid 3 on the
session runtime).
"""

import sys
from collections import defaultdict

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from trace_ops import load_trace  # noqa: E402


def device_events(data):
    dev_pids = {
        e["pid"]
        for e in data["traceEvents"]
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and str(e["args"].get("name", "")).startswith("/device:")
    }
    return [
        e
        for e in data["traceEvents"]
        if e.get("ph") == "X" and e["pid"] in dev_pids and "args" in e
    ]


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    steps, top, by = 10, 30, "source"
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--steps":
            steps = int(argv[i + 1])
        if a == "--top":
            top = int(argv[i + 1])
        if a == "--by":
            by = argv[i + 1]
    data = load_trace(args[0])
    evs = device_events(data)

    agg = defaultdict(lambda: [0, 0.0, 0])
    total = [0.0, 0]
    for e in evs:
        a = e["args"]
        cat = a.get("hlo_category")
        if cat is None:  # step/module envelopes, not ops
            continue
        if by == "source":
            key = f'{a.get("source", "?")} [{cat}]'
        elif by == "tfop":
            key = a.get("tf_op", "?")
        else:
            key = cat
        dur = e.get("dur", 0)
        byts = int(a.get("bytes_accessed", 0))
        agg[key][0] += 1
        agg[key][1] += dur
        agg[key][2] += byts
        total[0] += dur
        total[1] += byts

    print(
        f"device op time: {total[0]/1e3/steps:.2f} ms/step, "
        f"{total[1]/1e9/steps:.2f} GB/step accessed  (/{steps} steps)"
    )
    rows = sorted(agg.items(), key=lambda kv: -kv[1][1])[:top]
    w = max(len(k) for k, _ in rows)
    print(f"{'group':<{w}}  {'n/st':>5} {'ms/st':>7} {'MB/st':>8}")
    for k, (n, dur, byts) in rows:
        print(
            f"{k:<{w}}  {n//steps:>5} {dur/1e3/steps:>7.3f} "
            f"{byts/1e6/steps:>8.1f}"
        )


if __name__ == "__main__":
    main()
