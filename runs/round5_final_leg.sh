#!/bin/bash
# Round-5 final leg: runs AFTER the master chain exits (waits on its PID).
# Serialized order (one TPU process at a time, CPU suite only when the
# TPU is quiet — CLAUDE.md):
#   1. bench.py --guard   (the re-measurement PERF.md promised after the
#      round-4 guard tripped marginally on a hot chip)
#   2. warm-cache fast suite timing (VERDICT r4 #7 "Done" criterion)
#   3. commit both artifacts
#   4. assert nothing is left running (VERDICT r4 #8)
set -x
cd /root/repo

CHAIN_PID=$(cat /tmp/r5chain.pid 2>/dev/null)
while [ -n "$CHAIN_PID" ] && kill -0 "$CHAIN_PID" 2>/dev/null; do sleep 30; done
sleep 60  # let the relay go fully quiet between TPU processes

timeout 1500 python bench.py --guard > runs/bench_guard_r5.log 2>&1
echo "guard rc=$?" >> runs/bench_guard_r5.log

sleep 30
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu timeout 1500 \
  python -m pytest tests/ -x -q > runs/pytest_r5_warm.log 2>&1
echo "suite rc=$?" >> runs/pytest_r5_warm.log

git add -f runs/bench_guard_r5.log runs/pytest_r5_warm.log runs/round5_final_leg.sh
git commit -m "Round-5 final leg: guard re-measurement + warm-cache suite timing"

pgrep -f "uno_tpu.cli" && echo "WARNING: live cli process at final-leg end"
echo "final leg done $(date)"
