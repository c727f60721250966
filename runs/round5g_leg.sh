#!/bin/bash
# Round-5 leg G: finish the NS-2D 4000-trajectory flagship to its 200-epoch cap.
#
# Leg F's watchdog carries a 10:50 UTC wall deadline and will TERM the trainer
# around epoch ~183 (GracefulStop => no built-in test eval), then run the
# standalone eval and commit.  This leg resumes for the last ~17 epochs so the
# run completes NATURALLY at --epochs 200, which triggers the trainer's own
# reload-best held-out test eval (train/ns2d.py:200 `if ntest and not stopped`).
# Same stall-bounded resume loop as leg F (see runs/round5f_leg.sh rationale).
set -x
cd /root/repo

for i in $(seq 1 60); do
  grep -q "leg F done" runs/round5f_leg.out 2>/dev/null && break
  sleep 60
done
grep -q "leg F done" runs/round5f_leg.out 2>/dev/null || {
  echo "leg G: leg F never finished — aborting to avoid TPU overlap"; exit 1; }
sleep 150  # relay quiet gap

TRAIN_DEADLINE=$(date -ud "2026-08-20 12:05" +%s)

ok=""
for i in 1 2 3; do
  if timeout -k 30 240 python -c "import jax, jax.numpy as jnp; print('health', float(jax.jit(lambda x: (x*x).sum())(jnp.ones((256, 256)))))"; then
    ok=1; break
  fi
  sleep 150
done
[ -n "$ok" ] || { echo "leg G: TPU health check failed 3x — aborting"; exit 1; }

ATTEMPT=0
while :; do
  now=$(date +%s); [ "$now" -ge "$TRAIN_DEADLINE" ] && break
  # natural completion writes the test metrics into the training jsonl
  grep -q "test_step_rel_l2" runs/ns2d_full_r5.jsonl && break
  ATTEMPT=$((ATTEMPT + 1))
  LAUNCH=$(date +%s)
  python -m uno_tpu.cli train --preset ns2d --generate \
    --ntrain 4000 --nval 500 --ntest 500 --epochs 200 --dtype bfloat16 \
    --checkpoint-every 2 --resume \
    --data-cache runs/ns2d_full_data.npz --checkpoint-dir runs/ns2d_full_r5 \
    --log runs/ns2d_full_r5.jsonl >> runs/ns2d_full_r5.log 2>&1 &
  T=$!
  echo "$T" > /tmp/ns2d_r5g.pid
  while kill -0 "$T" 2>/dev/null; do
    sleep 30
    now=$(date +%s)
    m=$(stat -c %Y runs/ns2d_full_r5.jsonl 2>/dev/null || echo 0)
    if [ "$m" -gt "$LAUNCH" ]; then lim=240; ref=$m; else lim=900; ref=$LAUNCH; fi
    age=$(( now - ref ))
    if [ "$age" -gt "$lim" ] || [ "$now" -ge "$TRAIN_DEADLINE" ]; then
      echo "legG watchdog: attempt=$ATTEMPT age=${age}s lim=${lim}s at $(date -u)"
      kill -USR1 "$T" 2>/dev/null; sleep 8   # stack dump into the log
      kill -TERM "$T" 2>/dev/null; sleep 150 # GracefulStop: finish epoch + save
      kill -0 "$T" 2>/dev/null && { kill -TERM "$T" 2>/dev/null; sleep 30; }
      kill -0 "$T" 2>/dev/null && kill -KILL "$T" 2>/dev/null
      break
    fi
  done
  wait "$T"
  echo "legG attempt $ATTEMPT trainer rc=$?"
  rm -f /tmp/ns2d_r5g.pid
  git add -f runs/ns2d_full_r5.jsonl runs/ns2d_full_r5.log
  git commit -q -m "NS-2D flagship leg G attempt ${ATTEMPT}: training evidence" || true
  sleep 150  # relay quiet gap before relaunch
done

# Standalone eval only if the trainer never completed naturally (the
# built-in test eval is skipped under GracefulStop).
if ! grep -q "test_step_rel_l2" runs/ns2d_full_r5.jsonl; then
  for i in 1 2; do
    E0=$(date +%s)
    timeout -k 60 780 python -m uno_tpu.cli eval --preset ns2d \
      --ntrain 4000 --nval 500 --ntest 500 \
      --data-cache runs/ns2d_full_data.npz --checkpoint-dir runs/ns2d_full_r5 \
      --log runs/ns2d_full_r5_eval.jsonl >> runs/ns2d_full_r5_eval.log 2>&1
    rc=$?
    m=$(stat -c %Y runs/ns2d_full_r5_eval.jsonl 2>/dev/null || echo 0)
    if [ "$m" -gt "$E0" ]; then echo "legG eval ok rc=$rc"; break; fi
    echo "legG eval attempt $i wrote nothing (rc=$rc)"
    sleep 150
  done
fi

git add -f runs/ns2d_full_r5.jsonl runs/ns2d_full_r5.log \
  runs/ns2d_full_r5_eval.jsonl runs/ns2d_full_r5_eval.log runs/round5g_leg.sh
git commit -q -m "NS-2D flagship leg G: run completed to the 200-epoch cap" || true

pgrep -l -f "uno_tpu.cli" && echo "WARNING: live cli process at leg-G end"
echo "leg G done $(date -u)"
exit 0
