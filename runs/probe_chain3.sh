#!/bin/bash
set -x
cd /root/repo
UNO_TPU_FUSED_HEAD_F32=1 timeout 2400 python -m uno_tpu.cli train --preset darcy_s211 --generate --data-cache runs/darcy_s211_data.npz --epochs 250 --dtype bfloat16 --log runs/probe_p3_f32dots.log > /tmp/probe_p3.out 2>&1
echo "P3 rc=$?"
UNO_TPU_F32_RESAMPLE=1 UNO_TPU_F32_DENSE_OUT=1 UNO_TPU_FUSED_HEAD_F32=1 timeout 2400 python -m uno_tpu.cli train --preset darcy_s211 --generate --data-cache runs/darcy_s211_data.npz --epochs 250 --dtype bfloat16 --log runs/probe_p4_allf32.log > /tmp/probe_p4.out 2>&1
echo "P4 rc=$?"
