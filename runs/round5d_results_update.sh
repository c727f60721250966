#!/bin/bash
# After leg D: append the leg-3 outcome to the RESULTS.md flagship section
# and commit.  Detached so a session kill cannot lose the final numbers.
set -x
cd /root/repo

for i in $(seq 1 150); do
  grep -q "leg D done" runs/round5d_leg.out 2>/dev/null && break
  sleep 60
done
grep -q "leg D done" runs/round5d_leg.out 2>/dev/null || {
  echo "results update: leg D never finished"; exit 1; }

python - <<'EOF'
import json

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

ev_rows = ""
try:
    ev = json.loads(open("runs/ns2d_full_r5_eval.jsonl").read().strip().splitlines()[-1])
    ev_rows = ("re-evaluated held-out test per-step **{:.2f}%** / trajectory "
               "**{:.2f}%**".format(100 * ev["test_step_rel_l2"],
                                    100 * ev["test_traj_rel_l2"]))
except Exception as e:
    ev_rows = "re-eval failed: %s" % e

para = ("\n**Leg-3 update:** a third resumed leg (epochs 51–{last}, "
        "`runs/round5d_leg.sh` — watchdog now TERMs the python pid "
        "directly and carries an absolute wall deadline) took best val "
        "per-step to **{bval:.2f}%** / trajectory {btraj:.2f}% at epoch "
        "{bep}; {ev}.\n").format(
            last=last, bval=100 * best["val_step_rel_l2"],
            btraj=100 * best["val_traj_rel_l2"], bep=best["epoch"], ev=ev_rows)

marker = "restored across the resume).\n"
text = open("RESULTS.md").read()
if para.strip() not in text:
    i = text.index(marker) + len(marker)
    open("RESULTS.md", "w").write(text[:i] + para + text[i:])
    print("leg-3 update inserted")
EOF

git add RESULTS.md runs/round5d_results_update.sh
git commit -m "RESULTS: NS-2D flagship leg-3 endpoint (resumed past the StepLR drop)"
echo "results update done $(date)"
exit 0
