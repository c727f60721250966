#!/bin/bash
# Round-4 chain leg 2: after the NS3D 2048-traj run (pid in /tmp/ns3d_q4.pid)
# exits, wait for the relay to go quiet, then run ns2d_s256 at the FULL
# planned budget (VERDICT r3 #6: 300 traj x 150 epochs, f32 — same
# methodology as the round-3 96-epoch run it completes).
set -u
cd /root/repo
NS3D_PID=$(cat /tmp/ns3d_q4.pid)
while kill -0 "$NS3D_PID" 2>/dev/null; do sleep 30; done
sleep 150   # relay quiet period (CLAUDE.md recovery protocol)
nohup timeout 21600 python -m uno_tpu.cli train --preset ns2d_s256 \
  --generate --ntrain 300 --nval 40 --ntest 40 --epochs 150 \
  --data-cache runs/ns2d_s256_q4_data.npz \
  --checkpoint-dir runs/ns2d_s256_q4 --checkpoint-every 10 \
  --log runs/ns2d_s256_q4.jsonl > runs/ns2d_s256_q4.log 2>&1 &
echo $! > /tmp/s256_q4.pid
wait
