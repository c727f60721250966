#!/bin/bash
# Round-5 leg E: third resume of the NS-2D 4000-trajectory flagship, to push
# past the epoch-100 StepLR drop toward the 200-epoch cap.  Launches only
# after round5d_results_update.sh has banked the leg-3 numbers ("results
# update done"), so the TPU is strictly serialized.  Watchdog is the leg-D
# design (TERM the python pid directly; staleness vs max(mtime, launch);
# absolute wall deadline).  After the trainer: eval, RESULTS.md table
# refresh, warm fast CPU suite (TPU quiet by then), all committed in-leg.
set -x
cd /root/repo

for i in $(seq 1 150); do
  grep -q "results update done" runs/round5d_results_update.out 2>/dev/null && break
  sleep 60
done
grep -q "results update done" runs/round5d_results_update.out 2>/dev/null || {
  echo "leg E: results update never finished — aborting to avoid TPU overlap"; exit 1; }
sleep 120   # relay quiet gap

LAUNCH=$(date +%s)
DEADLINE=$(date -ud "2026-08-20 08:50" +%s)

python -m uno_tpu.cli train --preset ns2d --generate \
  --ntrain 4000 --nval 500 --ntest 500 --epochs 200 --dtype bfloat16 \
  --checkpoint-every 2 --resume \
  --data-cache runs/ns2d_full_data.npz --checkpoint-dir runs/ns2d_full_r5 \
  --log runs/ns2d_full_r5.jsonl >> runs/ns2d_full_r5.log 2>&1 &
TRAINER=$!
echo "$TRAINER" > /tmp/ns2d_r5e.pid

(
  while kill -0 "$TRAINER" 2>/dev/null; do
    nowts=$(date +%s)
    m=$(stat -c %Y runs/ns2d_full_r5.jsonl 2>/dev/null || echo 0)
    ref=$(( m > LAUNCH ? m : LAUNCH ))
    age=$(( nowts - ref ))
    if [ "$age" -gt 1200 ] || [ "$nowts" -gt "$DEADLINE" ]; then
      echo "WATCHDOG: stopping trainer (age=${age}s, now=$nowts, deadline=$DEADLINE) at $(date)"
      kill -TERM "$TRAINER" 2>/dev/null; sleep 180   # GracefulStop: finish epoch + save
      kill -TERM "$TRAINER" 2>/dev/null; sleep 45    # wedged: second TERM exits immediately
      kill -KILL "$TRAINER" 2>/dev/null
      break
    fi
    sleep 60
  done
) >> runs/ns2d_watchdog.log 2>&1 &
WATCHDOG=$!

wait "$TRAINER"
echo "leg E trainer rc=$?"
rm -f /tmp/ns2d_r5e.pid
kill "$WATCHDOG" 2>/dev/null

git add -f runs/ns2d_full_r5.jsonl runs/ns2d_full_r5.log runs/ns2d_watchdog.log \
  runs/round5e_leg.sh
git commit -m "NS-2D 4000-trajectory flagship leg 4 (resumed past the StepLR drop): training evidence"

sleep 120   # relay quiet gap

timeout 1200 python -m uno_tpu.cli eval --preset ns2d \
  --ntrain 4000 --nval 500 --ntest 500 \
  --data-cache runs/ns2d_full_data.npz --checkpoint-dir runs/ns2d_full_r5 \
  --log runs/ns2d_full_r5_eval.jsonl >> runs/ns2d_full_r5_eval.log 2>&1
echo "leg E eval rc=$?"

git add -f runs/ns2d_full_r5_eval.jsonl runs/ns2d_full_r5_eval.log
git commit -m "NS-2D 4000-trajectory flagship: held-out eval after leg 4"

# Refresh the flagship table in RESULTS.md with the final endpoint and add
# the leg-4 paragraph.
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

ev = json.loads(open("runs/ns2d_full_r5_eval.jsonl").read().strip().splitlines()[-1])

text = open("RESULTS.md").read()
rows = {
    r"\| epochs completed \(200 cap, wall-bounded\) \| \S+ \|":
        "| epochs completed (200 cap, wall-bounded) | %d |" % (last + 1),
    r"\| best val per-step rel-L2 \(epoch \d+\) \| \S+ \|":
        "| best val per-step rel-L2 (epoch %d) | %.2f%% |"
        % (best["epoch"], 100 * best["val_step_rel_l2"]),
    r"\| best val trajectory rel-L2 \(same epoch\) \| \S+ \|":
        "| best val trajectory rel-L2 (same epoch) | %.2f%% |"
        % (100 * best["val_traj_rel_l2"]),
    r"\| held-out test per-step rel-L2 \| \S+ \|":
        "| held-out test per-step rel-L2 | **%.2f%%** |"
        % (100 * ev["test_step_rel_l2"]),
    r"\| held-out test trajectory rel-L2 \| \S+ \|":
        "| held-out test trajectory rel-L2 | **%.2f%%** |"
        % (100 * ev["test_traj_rel_l2"]),
}
for pat, rep in rows.items():
    text, n = re.subn(pat, lambda m: rep, text, count=1)
    if n != 1:
        print("WARN: row not found:", pat)

para = ("\n**Leg-4 update (final endpoint):** a fourth resumed leg "
        "(`runs/round5e_leg.sh`) carried training through the epoch-100 "
        "StepLR halving to epoch {last}; best val per-step **{bval:.2f}%** / "
        "trajectory {btraj:.2f}% at epoch {bep}; the table above holds the "
        "final re-evaluated held-out numbers.\n").format(
            last=last, bval=100 * best["val_step_rel_l2"],
            btraj=100 * best["val_traj_rel_l2"], bep=best["epoch"])
marker = "### 512"
if para.strip() not in text:
    i = text.index(marker)
    text = text[:i] + para + "\n" + text[i:]
open("RESULTS.md", "w").write(text)
print("leg-4 table + paragraph written")
EOF

git add RESULTS.md runs/round5e_leg.sh
git commit -m "RESULTS: NS-2D flagship final endpoint (leg 4, through the StepLR drop)"

# Warm fast suite — TPU is quiet from here on; compile cache is populated.
SUITE_T0=$SECONDS
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu timeout 3600 python -m pytest tests/ -q \
  > runs/pytest_r5_warm.log 2>&1
SUITE_RC=$?
SUITE_SEC=$(( SECONDS - SUITE_T0 ))
echo "suite rc=$SUITE_RC wall=${SUITE_SEC}s" >> runs/pytest_r5_warm.log
git add -f runs/pytest_r5_warm.log
git commit -m "Round-5: warm-cache fast suite after the flagship chain (rc=$SUITE_RC, ${SUITE_SEC}s)"

pgrep -l -f "uno_tpu.cli" && echo "WARNING: live cli process at leg-E end"
echo "leg E done $(date)"
exit 0
