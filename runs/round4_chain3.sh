#!/bin/bash
# Round-4 chain leg 3: serialized follow-ups after the full-budget
# ns2d_s256 run (pid in /tmp/s256_q4.pid) exits.  Every step runs
# strictly after the previous one exits + a relay quiet period
# (CLAUDE.md: ALL jax work must be serialized on this session).
set -u
cd /root/repo
S256_PID=$(cat /tmp/s256_q4.pid)
while kill -0 "$S256_PID" 2>/dev/null; do sleep 60; done
sleep 150   # relay quiet period

echo "=== 1. zero-shot 512^2 super-res of the s256_q4 flagship (TPU) ==="
timeout 3000 python examples/ns2d_superres_eval.py runs/ns2d_s256_q4 \
  --preset ns2d_s256 --size 512 --n 4 --batch 2 \
  > runs/ns2d_superres_512_q4.log 2>&1
echo "superres rc=$?"
sleep 150

echo "=== 2. gen-profile comparison (TPU; VERDICT r3 weak #2 artifact) ==="
timeout 3600 python examples/gen_profile_compare.py \
  --out runs/gen_profile_compare.json > runs/gen_profile_compare.log 2>&1
echo "genprofile rc=$?"
sleep 150

echo "=== 3. spatial-scaling JSON (8-device CPU mesh) ==="
PALLAS_AXON_POOL_IPS= timeout 3600 python examples/spatial_scaling_bench.py \
  > runs/spatial_scaling.log 2>&1
echo "spatial rc=$?"
sleep 60

echo "=== 4. dp-child verification of the virtual_mesh bench edit (CPU) ==="
UNO_TPU_BENCH_CHILD=1 PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  timeout 1200 python bench.py --_dp-child > runs/dp_child_verify.log 2>&1
echo "dpchild rc=$?"
sleep 60

echo "=== 5. fast test suite (CPU x 8) ==="
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu timeout 3600 \
  python -m pytest tests/ -x -q > runs/pytest_r4_tail.log 2>&1
echo "pytest rc=$?"
sleep 150

echo "=== 6. perf regression guard (TPU, 4 families) ==="
timeout 1800 python bench.py --guard > runs/bench_guard_r4.log 2>&1
echo "guard rc=$?"
echo "=== chain3 done ==="
