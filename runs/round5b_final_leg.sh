#!/bin/bash
# Round-5 final leg (session 2): runs AFTER round5b_ns2d_chain.sh prints
# "chain done".  Serialized: bench (TPU) first, then the CPU suite with
# the axon plugin disabled.  Every step carries an ABSOLUTE start-time
# gate so worst-case timeout stacking can never overlap the driver's
# round-end bench.py (~06:37 UTC snapshot; a CPU suite running
# concurrently with a TPU process wedges the relay — CLAUDE.md).
set -x
cd /root/repo

now() { date -u +%H%M | sed 's/^0*//'; }

# 1. wait for the training chain to finish (bounded)
for i in $(seq 1 200); do
  grep -q "chain done" runs/round5b_ns2d_chain.out 2>/dev/null && break
  sleep 60
done
grep -q "chain done" runs/round5b_ns2d_chain.out 2>/dev/null || {
  echo "final leg: chain never finished — aborting to avoid TPU overlap"; exit 1; }

sleep 120  # relay quiet gap

# 2. perf regression guard across all 4 families — the re-measurement
#    PERF.md promised after round 4's marginal ns2d_bf16 trip on a hot
#    chip (the headline-first contract for BENCH_r05 is already proven
#    by the committed bench_r05_full.out on this exact code).
#    Gate: start <05:50.
if [ "$(now)" -lt 550 ]; then
  timeout 1500 python bench.py --guard > runs/bench_guard_r5.log 2>&1
  echo "guard rc=$?" >> runs/bench_guard_r5.log
  git add -f runs/bench_guard_r5.log runs/round5b_final_leg.sh
  git commit -m "Round-5 final leg: perf guard re-measurement (4 families)"
fi

# 2b. dryrun_multichip(8) validation on the virtual CPU mesh: the
#     tensor-parallel block (ad2ec94) landed AFTER the round-4 driver
#     multichip check and no test exercises the dryrun wrapper itself.
#     Gate: start <06:00.
if [ "$(now)" -lt 600 ]; then
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    timeout 900 python -c "import __graft_entry__ as g; g.dryrun_multichip(8); print('dryrun ok')" \
    > runs/dryrun_r5_check.log 2>&1
  echo "dryrun rc=$?" >> runs/dryrun_r5_check.log
  git add -f runs/dryrun_r5_check.log
  git commit -m "Round-5 final leg: dryrun_multichip(8) validation incl. tensor-parallel block"
fi

# 3. cold fast suite (CPU, axon disabled, TPU quiet).  ~25 min on the
#    1-core VM; gate: start <06:02 so the 2100-s cap ends before 06:37.
if [ "$(now)" -lt 602 ]; then
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu timeout 2100 \
    python -m pytest tests/ -x -q > runs/pytest_r5_final.log 2>&1
  echo "suite rc=$?" >> runs/pytest_r5_final.log
  git add -f runs/pytest_r5_final.log
  git commit -m "Round-5 final leg: fast suite (cold, 1-core CPU)"
fi

pgrep -f "uno_tpu.cli" && echo "WARNING: live cli process at final-leg end"
echo "final leg done $(date)"
exit 0
