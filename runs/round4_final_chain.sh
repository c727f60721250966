#!/bin/bash
set -x
cd /root/repo
echo "=== full700 rerun, fixed f32 head ==="
timeout 3600 python -m uno_tpu.cli train --preset darcy_s211 --generate --dtype bfloat16 \
  --data-cache runs/darcy_s211_data.npz \
  --checkpoint-dir runs/darcy_s211_full_f32head --checkpoint-every 100 \
  --log runs/darcy_s211_full700_f32head.log
echo "=== full700 rc=$? ==="
echo "=== bench ==="
timeout 3000 python bench.py > runs/bench_r04_final.out 2>&1
echo "=== bench rc=$? ==="
