#!/bin/bash
# Round-5 leg C: RESUME the NS-2D 4000-trajectory flagship from the
# epoch-19 train_state (leg B was SIGTERM'd at the previous session
# boundary, 03:44 UTC; GracefulStop saved full state).  Same config,
# --resume restores params/opt/epoch/best_val and continues to the
# 200-epoch cap or the wall, whichever first.
#
# Sizing (launched ~04:18 UTC, session boundary ~08:1x UTC):
#   * 54.6 s/epoch measured (bf16, batch 16, 73.2 samples/s) + ~3-6 min
#     resume startup (4 GB cache load + compile).
#   * timeout 7800 s -> TERM ~06:28, GracefulStop finishes the epoch and
#     saves (~epoch 150-155); eval by ~07:05; bench sanity + CPU suite
#     still fit with >1 h slack.
# Watchdog fix vs round5b: age is measured against max(jsonl mtime,
# LAUNCH time) — the jsonl already has content from leg B, so a plain
# mtime gate would see age≈35 min at t=0 and kill a healthy resume
# during cache-load/compile.
set -x
cd /root/repo
LAUNCH=$(date +%s)

(
  sleep 120
  while [ -f /tmp/ns2d_r5c.pid ] && kill -0 "$(cat /tmp/ns2d_r5c.pid)" 2>/dev/null; do
    m=$(stat -c %Y runs/ns2d_full_r5.jsonl 2>/dev/null || echo 0)
    ref=$(( m > LAUNCH ? m : LAUNCH ))
    age=$(( $(date +%s) - ref ))
    if [ "$age" -gt 1200 ]; then
      echo "WATCHDOG: jsonl stale ${age}s at $(date) — stopping trainer"
      P=$(cat /tmp/ns2d_r5c.pid)
      kill -TERM "$P" 2>/dev/null; sleep 240   # GracefulStop: finish epoch + save
      kill -TERM "$P" 2>/dev/null; sleep 60    # second TERM exits immediately
      kill -KILL "$P" 2>/dev/null
      break
    fi
    sleep 60
  done
) >> runs/ns2d_watchdog.log 2>&1 &
WATCHDOG=$!

timeout -k 600 -s TERM 7800 python -m uno_tpu.cli train --preset ns2d --generate \
  --ntrain 4000 --nval 500 --ntest 500 --epochs 200 --dtype bfloat16 \
  --checkpoint-every 2 --resume \
  --data-cache runs/ns2d_full_data.npz --checkpoint-dir runs/ns2d_full_r5 \
  --log runs/ns2d_full_r5.jsonl >> runs/ns2d_full_r5.log 2>&1 &
echo $! > /tmp/ns2d_r5c.pid
wait "$(cat /tmp/ns2d_r5c.pid)"
echo "ns2d resume rc=$?"
rm -f /tmp/ns2d_r5c.pid
kill "$WATCHDOG" 2>/dev/null

git add -f runs/ns2d_full_r5.jsonl runs/ns2d_full_r5.log runs/ns2d_watchdog.log \
  runs/round5c_resume_chain.sh
git commit -m "NS-2D 4000-trajectory flagship leg 2 (resumed from epoch 19): training evidence"

sleep 120   # relay quiet gap between TPU processes

if ! grep -q '"test_' runs/ns2d_full_r5.jsonl; then
  timeout 1800 python -m uno_tpu.cli eval --preset ns2d \
    --ntrain 4000 --nval 500 --ntest 500 \
    --data-cache runs/ns2d_full_data.npz --checkpoint-dir runs/ns2d_full_r5 \
    --log runs/ns2d_full_r5_eval.jsonl > runs/ns2d_full_r5_eval.log 2>&1
  echo "ns2d standalone eval rc=$?"
fi

git add -f runs/ns2d_full_r5_eval.jsonl runs/ns2d_full_r5_eval.log 2>/dev/null
git commit -m "NS-2D 4000-trajectory held-out eval (evidence)"

pgrep -l -f "uno_tpu.cli" && echo "WARNING: live cli process at chain end"
echo "chain done $(date)"
exit 0
