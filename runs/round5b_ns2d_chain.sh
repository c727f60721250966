#!/bin/bash
# Round-5 leg B (relaunched): NS-2D flagship at the FULL reference
# trajectory count 4000/500/500 (/root/reference/ns_uno2d_main.py:26-35),
# VERDICT r4 #4 — the one flagship config never reproduced at data budget.
# The original master-chain leg B never ran: leg A (NS-3D 9000) consumed
# the round-4->5 boundary, and the workspace reset deleted the data caches.
#
# Sizing (launched ~02:42 UTC, round boundary ~06:37 UTC):
#   * gen ~18 min (5000 traj at 64^2, measured-rate estimate from the
#     256^2 generator profile) + compile, then ~55-220 s/epoch (the 55 s
#     estimate assumed bf16 batch-16 scaling from the 18-samples/s f32
#     sanity run; unverified — hence epochs 200 with the WALL as the
#     bound, GracefulStop saves best-val state on SIGTERM).
#   * timeout 8300 s ends the trainer by ~05:01; eval by ~05:30; the
#     final leg (bench sanity + cold suite) still fits before snapshot.
# Wedge-hardening (same as round5_resume_chain.sh): watchdog kills the
# trainer BY PID if the metric JSONL goes stale >600 s once it exists;
# evidence is git-committed in the same leg that produces it (VERDICT #2).
set -x
cd /root/repo

(
  # Wait for the jsonl to have CONTENT (first epoch line), not merely to
  # exist: the CLI opens the --log file at startup, so an existence gate
  # passes during generation and the staleness rule then kills a healthy
  # gen phase (exactly what happened on the first launch of this chain —
  # 02:52 UTC kill at age=655 s while 5000 trajectories were generating).
  # Gen-phase hangs are covered by the outer `timeout`, not the watchdog.
  while [ -f /tmp/ns2d_r5b.pid ] && kill -0 "$(cat /tmp/ns2d_r5b.pid)" 2>/dev/null \
        && [ ! -s runs/ns2d_full_r5.jsonl ]; do sleep 60; done
  sleep 60
  while [ -f /tmp/ns2d_r5b.pid ] && kill -0 "$(cat /tmp/ns2d_r5b.pid)" 2>/dev/null; do
    age=$(( $(date +%s) - $(stat -c %Y runs/ns2d_full_r5.jsonl 2>/dev/null || echo 0) ))
    if [ "$age" -gt 900 ] && [ "$age" -lt 100000 ]; then
      echo "WATCHDOG: jsonl stale ${age}s at $(date) — stopping trainer"
      P=$(cat /tmp/ns2d_r5b.pid)
      kill -TERM "$P" 2>/dev/null; sleep 240   # GracefulStop: finish epoch + save
      kill -TERM "$P" 2>/dev/null; sleep 60    # second TERM exits immediately
      kill -KILL "$P" 2>/dev/null
      break
    fi
    sleep 60
  done
) >> runs/ns2d_watchdog.log 2>&1 &
WATCHDOG=$!

timeout -k 600 -s TERM 7600 python -m uno_tpu.cli train --preset ns2d --generate \
  --ntrain 4000 --nval 500 --ntest 500 --epochs 200 --dtype bfloat16 \
  --checkpoint-every 2 \
  --data-cache runs/ns2d_full_data.npz --checkpoint-dir runs/ns2d_full_r5 \
  --log runs/ns2d_full_r5.jsonl > runs/ns2d_full_r5.log 2>&1 &
echo $! > /tmp/ns2d_r5b.pid
wait "$(cat /tmp/ns2d_r5b.pid)"
echo "ns2d full rc=$?"
rm -f /tmp/ns2d_r5b.pid
kill "$WATCHDOG" 2>/dev/null

git add -f runs/ns2d_full_r5.jsonl runs/ns2d_full_r5.log runs/ns2d_watchdog.log \
  runs/round5b_ns2d_chain.sh
git commit -m "NS-2D flagship at the full 4000-trajectory reference count: training evidence"

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
