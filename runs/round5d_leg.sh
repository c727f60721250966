#!/bin/bash
# Round-5 leg D: second resume of the NS-2D 4000-trajectory flagship.
# Leg C wedged after epoch 50 (relay stall, the round-4 failure mode);
# its watchdog TERM'd the `timeout` WRAPPER pid, which died and orphaned
# the wedged python — fixed here by (a) backgrounding the python directly
# so the pid file holds the python pid, and (b) one watchdog loop that
# fires on EITHER jsonl staleness (>1200 s vs max(mtime, launch)) OR the
# absolute wall deadline 07:25 UTC.  Runs AFTER round5c_final_leg.sh has
# finished the guard + dryrun + suite (banked by ~06:25), so the only
# thing behind leg D is its own eval — TPU quiet from ~07:45, session
# boundary ~08:10.
set -x
cd /root/repo

for i in $(seq 1 90); do
  grep -q "final leg done" runs/round5c_final_leg.out 2>/dev/null && break
  sleep 60
done
grep -q "final leg done" runs/round5c_final_leg.out 2>/dev/null || {
  echo "leg D: final leg never finished — aborting to avoid TPU overlap"; exit 1; }
sleep 120   # relay quiet gap after the guard

LAUNCH=$(date +%s)
DEADLINE=$(date -ud "2026-08-20 07:25" +%s)

python -m uno_tpu.cli train --preset ns2d --generate \
  --ntrain 4000 --nval 500 --ntest 500 --epochs 200 --dtype bfloat16 \
  --checkpoint-every 2 --resume \
  --data-cache runs/ns2d_full_data.npz --checkpoint-dir runs/ns2d_full_r5 \
  --log runs/ns2d_full_r5.jsonl >> runs/ns2d_full_r5.log 2>&1 &
TRAINER=$!
echo "$TRAINER" > /tmp/ns2d_r5d.pid

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
echo "leg D trainer rc=$?"
rm -f /tmp/ns2d_r5d.pid
kill "$WATCHDOG" 2>/dev/null

git add -f runs/ns2d_full_r5.jsonl runs/ns2d_full_r5.log runs/ns2d_watchdog.log \
  runs/round5d_leg.sh
git commit -m "NS-2D 4000-trajectory flagship leg 3 (resumed from epoch 50): training evidence"

sleep 120   # relay quiet gap

# re-eval unconditionally: best_params may have advanced past the leg-C
# eval; the eval jsonl is append-mode and downstream readers take the
# LAST line.
timeout 1200 python -m uno_tpu.cli eval --preset ns2d \
  --ntrain 4000 --nval 500 --ntest 500 \
  --data-cache runs/ns2d_full_data.npz --checkpoint-dir runs/ns2d_full_r5 \
  --log runs/ns2d_full_r5_eval.jsonl >> runs/ns2d_full_r5_eval.log 2>&1
echo "leg D eval rc=$?"

git add -f runs/ns2d_full_r5_eval.jsonl runs/ns2d_full_r5_eval.log
git commit -m "NS-2D 4000-trajectory flagship: held-out eval after leg 3"

pgrep -l -f "uno_tpu.cli" && echo "WARNING: live cli process at leg-D end"
echo "leg D done $(date)"
exit 0
