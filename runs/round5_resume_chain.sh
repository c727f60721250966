#!/bin/bash
# Round-5 resume chain (leg A'): continue the NS-3D 9000-trajectory run
# (VERDICT r4 #3) after the ~23:50 relay wedge killed the first leg at
# epoch 7 (best val 1.42% full-field at epoch 6, evidence committed
# 6391239).  Changes vs the first leg, all wedge-hardened:
#   * --resume from the epoch-0 train_state (only checkpoint present:
#     the first leg used --checkpoint-every 10); --checkpoint-every 2
#     so a repeat stall loses <=2 epochs.
#   * epochs 26 sized to FINISH CLEANLY inside the bound at the
#     measured 141-233 s/epoch spread, so the trainer runs its own
#     held-out test eval; the standalone eval runs afterwards either way.
#   * a watchdog kills the trainer BY PID if the metric JSONL goes
#     stale >600 s (the first-leg stall burned 20 min before a human
#     noticed); 1200 s initial grace for npz load + compile + the
#     post-wedge slow first device call (memory: 2-5 min observed).
#   * best_params (epoch 6) is backed up first: the resumed BestTracker
#     restarts from the epoch-0 best_val (3.37%) and would overwrite
#     the on-disk best with an early worse save.
# Budget: round boundary ~03:38 UTC; this chain must be TPU-quiet by
# ~03:05 so the driver's bench.py finds a healthy relay.
set -x
cd /root/repo

rm -rf runs/ns3d_full_r5_best_epoch6
cp -r runs/ns3d_full_r5/best_params runs/ns3d_full_r5_best_epoch6

(
  sleep 1200
  while [ -f /tmp/ns3d_resume.pid ] && kill -0 "$(cat /tmp/ns3d_resume.pid)" 2>/dev/null; do
    age=$(( $(date +%s) - $(stat -c %Y runs/ns3d_full_r5.jsonl) ))
    if [ "$age" -gt 600 ]; then
      echo "WATCHDOG: jsonl stale ${age}s at $(date) — stopping trainer"
      P=$(cat /tmp/ns3d_resume.pid)
      kill -TERM "$P" 2>/dev/null; sleep 240   # GracefulStop: finish epoch + save
      kill -TERM "$P" 2>/dev/null; sleep 60    # second TERM exits immediately
      kill -KILL "$P" 2>/dev/null
      break
    fi
    sleep 60
  done
) >> runs/ns3d_watchdog.log 2>&1 &
WATCHDOG=$!

timeout -k 300 -s TERM 6000 python -m uno_tpu.cli train --preset ns3d_t40 \
  --ntrain 9000 --nval 1000 --ntest 1000 --epochs 26 --batch-size 16 \
  --checkpoint-every 2 --resume \
  --data-cache runs/ns3d_full_data.npz --checkpoint-dir runs/ns3d_full_r5 \
  --log runs/ns3d_full_r5.jsonl > runs/ns3d_full_r5b.log 2>&1 &
echo $! > /tmp/ns3d_resume.pid
wait "$(cat /tmp/ns3d_resume.pid)"
echo "ns3d resume rc=$?"
rm -f /tmp/ns3d_resume.pid
kill "$WATCHDOG" 2>/dev/null

git add -f runs/ns3d_full_r5.jsonl runs/ns3d_full_r5b.log runs/ns3d_watchdog.log runs/round5_resume_chain.sh
git commit -m "NS-3D 9000-trajectory resumed leg: training evidence"

sleep 120   # relay quiet gap between TPU processes

timeout 1500 python -m uno_tpu.cli eval --preset ns3d_t40 \
  --ntrain 9000 --nval 1000 --ntest 1000 --batch-size 16 \
  --data-cache runs/ns3d_full_data.npz --checkpoint-dir runs/ns3d_full_r5 \
  --log runs/ns3d_full_r5_eval.jsonl > runs/ns3d_full_r5_eval.log 2>&1
echo "ns3d standalone eval rc=$?"

git add -f runs/ns3d_full_r5_eval.jsonl runs/ns3d_full_r5_eval.log
git commit -m "NS-3D 9000-trajectory held-out eval (evidence)"

pgrep -l -f "uno_tpu.cli" && echo "WARNING: live cli process at chain end"
echo "chain done $(date)"
exit 0
