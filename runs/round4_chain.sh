#!/bin/bash
# Round-4 quality-run chain (VERDICT r3 #2/#3/#4/#6): serialized TPU runs.
# Run from /root/repo. Each stage logs to runs/ and the evidence files are
# force-added afterwards (the runs/ dir is gitignored).
set -x
cd /root/repo

echo "=== stage 1: Darcy S=211 FULL reference budget (700 epochs, bf16) ==="
timeout 14400 python -m uno_tpu.cli train --preset darcy_s211 --generate \
  --dtype bfloat16 \
  --data-cache runs/darcy_s211_data.npz \
  --checkpoint-dir runs/darcy_s211_full \
  --checkpoint-every 25 \
  --log runs/darcy_s211_full700.log
echo "=== stage 1 rc=$? ==="

echo "=== stage 2: NS3D T40 at 2048 trajectories, 80 epochs (f32) ==="
timeout 18000 python -m uno_tpu.cli train --preset ns3d_t40 --generate \
  --ntrain 2048 --nval 256 --ntest 256 --epochs 80 \
  --data-cache runs/ns3d_t40_q4_data.npz \
  --checkpoint-dir runs/ns3d_t40_q4 \
  --checkpoint-every 10 \
  --log runs/ns3d_t40_q4.log
echo "=== stage 2 rc=$? ==="

echo "=== stage 3: NS2D 256^2 full planned budget (150 epochs, 300 traj) ==="
timeout 18000 python -m uno_tpu.cli train --preset ns2d_s256 --generate \
  --ntrain 300 --nval 40 --ntest 40 --epochs 150 --batch-size 8 \
  --data-cache runs/ns2d_s256_q4_data.npz \
  --checkpoint-dir runs/ns2d_s256_q4 \
  --checkpoint-every 10 \
  --log runs/ns2d_s256_q4.log
echo "=== stage 3 rc=$? ==="

echo "=== stage 4: gen-profile comparison (fast vs reference integration) ==="
timeout 3600 python examples/gen_profile_compare.py \
  --out runs/gen_profile_compare.json
echo "=== stage 4 rc=$? ==="

echo "=== chain done ==="
