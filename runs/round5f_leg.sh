#!/bin/bash
# Round-5 leg F: push the NS-2D 4000-trajectory flagship past epoch 52.
#
# Legs D/E each advanced only ~2 epochs before a silent relay wedge (the
# jsonl goes quiet right where train_state saves — see RESULTS.md).  This
# leg designs around the wedge instead of hoping it away:
#   * resume LOOP: each stall costs ~5 min (staleness 240 s once the first
#     record lands), then kill + quiet gap + relaunch, until the deadline;
#   * kill -USR1 first: cli.py now registers faulthandler on SIGUSR1, so
#     every stall leaves a full Python stack dump in the trainer log;
#   * checkpoint.py now saves atomically (tmp dir + rename swap) and moves
#     the whole state in one d2h per dtype, so kills cannot destroy the
#     resume point and saves expose far fewer relay round-trips.
# Eval runs with a retry and is only trusted if the jsonl mtime advances
# past the attempt start (the leg-D/E evals timed out writing nothing).
set -x
cd /root/repo

for i in $(seq 1 100); do
  grep -q "leg E done" runs/round5e_leg.out 2>/dev/null && break
  sleep 60
done
grep -q "leg E done" runs/round5e_leg.out 2>/dev/null || {
  echo "leg F: leg E never finished — aborting to avoid TPU overlap"; exit 1; }
sleep 180  # relay quiet gap

TRAIN_DEADLINE=$(date -ud "2026-08-20 10:50" +%s)

ok=""
for i in 1 2 3; do
  if timeout -k 30 240 python -c "import jax, jax.numpy as jnp; print('health', float(jax.jit(lambda x: (x*x).sum())(jnp.ones((256, 256)))))"; then
    ok=1; break
  fi
  sleep 150
done
[ -n "$ok" ] || { echo "leg F: TPU health check failed 3x — aborting"; exit 1; }

ATTEMPT=0
while :; do
  now=$(date +%s); [ "$now" -ge "$TRAIN_DEADLINE" ] && break
  ATTEMPT=$((ATTEMPT + 1))
  LAUNCH=$(date +%s)
  python -m uno_tpu.cli train --preset ns2d --generate \
    --ntrain 4000 --nval 500 --ntest 500 --epochs 200 --dtype bfloat16 \
    --checkpoint-every 2 --resume \
    --data-cache runs/ns2d_full_data.npz --checkpoint-dir runs/ns2d_full_r5 \
    --log runs/ns2d_full_r5.jsonl >> runs/ns2d_full_r5.log 2>&1 &
  T=$!
  echo "$T" > /tmp/ns2d_r5f.pid
  while kill -0 "$T" 2>/dev/null; do
    sleep 30
    now=$(date +%s)
    m=$(stat -c %Y runs/ns2d_full_r5.jsonl 2>/dev/null || echo 0)
    if [ "$m" -gt "$LAUNCH" ]; then lim=240; ref=$m; else lim=900; ref=$LAUNCH; fi
    age=$(( now - ref ))
    if [ "$age" -gt "$lim" ] || [ "$now" -ge "$TRAIN_DEADLINE" ]; then
      echo "legF watchdog: attempt=$ATTEMPT age=${age}s lim=${lim}s at $(date -u)"
      kill -USR1 "$T" 2>/dev/null; sleep 8   # stack dump into the log
      kill -TERM "$T" 2>/dev/null; sleep 150 # GracefulStop: finish epoch + save
      kill -0 "$T" 2>/dev/null && { kill -TERM "$T" 2>/dev/null; sleep 30; }
      kill -0 "$T" 2>/dev/null && kill -KILL "$T" 2>/dev/null
      break
    fi
  done
  wait "$T"
  echo "legF attempt $ATTEMPT trainer rc=$?"
  rm -f /tmp/ns2d_r5f.pid
  git add -f runs/ns2d_full_r5.jsonl runs/ns2d_full_r5.log
  git commit -q -m "NS-2D flagship leg F attempt ${ATTEMPT}: training evidence" || true
  sleep 150  # relay quiet gap before relaunch
done

for i in 1 2; do
  E0=$(date +%s)
  timeout -k 60 780 python -m uno_tpu.cli eval --preset ns2d \
    --ntrain 4000 --nval 500 --ntest 500 \
    --data-cache runs/ns2d_full_data.npz --checkpoint-dir runs/ns2d_full_r5 \
    --log runs/ns2d_full_r5_eval.jsonl >> runs/ns2d_full_r5_eval.log 2>&1
  rc=$?
  m=$(stat -c %Y runs/ns2d_full_r5_eval.jsonl 2>/dev/null || echo 0)
  if [ "$m" -gt "$E0" ]; then echo "legF eval ok rc=$rc"; break; fi
  echo "legF eval attempt $i wrote nothing (rc=$rc)"
  sleep 150
done

git add -f runs/ns2d_full_r5_eval.jsonl runs/ns2d_full_r5_eval.log runs/round5f_leg.sh
git commit -q -m "NS-2D flagship leg F: held-out eval" || true

pgrep -l -f "uno_tpu.cli" && echo "WARNING: live cli process at leg-F end"
echo "leg F done $(date -u)"
exit 0
