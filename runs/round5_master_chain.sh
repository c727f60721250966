#!/bin/bash
# Round-5 master chain: the two reference-budget flagship runs (VERDICT r4
# #3/#4), strictly serialized on the single axon TPU, each leg committing
# its own evidence (VERDICT r4 #2/#8).
#
# Sizing (from measured throughputs, RESULTS.md / bench_detail.json),
# re-trimmed at launch (~21:55 UTC) after a ~40 min relay-wedge recovery
# ate into the clock — the chain must END >=30 min before the round
# boundary with no live TPU process (VERDICT r4 #8):
#  leg A  NS-3D Uno3D_T40, FULL reference dataset 9000/1000/1000
#         (/root/reference/ns_uno3d_main.py:33-42), f32 (the round-4
#         quality-proven policy; bf16 is unverified for 3D), batch 16.
#         gen ~50 min (11000 traj; 10.5 min/2304 measured r4) +
#         48 epochs x ~120 s = ~1h36m + compile/evals -> bound 10200 s.
#         48 epochs chosen to FINISH CLEANLY inside the bound (trainer
#         then runs its own test eval); r4's 2048-traj run peaked at
#         epoch 68/80, and at 4.4x the data fewer passes are needed.
#  leg B  NS-2D UNO, FULL reference trajectory count 4000/500/500
#         (/root/reference/ns_uno2d_main.py:26-35), bfloat16 (quality-
#         verified round 3), full 40-step BPTT, batch 16.
#         gen ~18 min (64^2 is ~16x cheaper per traj than the measured
#         256^2 rate) + 96 epochs x ~55 s = ~1h46m -> bound 7800 s.
# Both bounds SIGTERM -> GracefulStop (saves best-val state mid-epoch);
# the standalone eval fallback produces the held-out number either way.
set -x
cd /root/repo

# ---------------- leg A: NS-3D at the full reference dataset ----------------
timeout -k 900 -s TERM 10200 python -m uno_tpu.cli train --preset ns3d_t40 --generate \
  --ntrain 9000 --nval 1000 --ntest 1000 --epochs 48 --batch-size 16 \
  --checkpoint-every 10 \
  --data-cache runs/ns3d_full_data.npz --checkpoint-dir runs/ns3d_full_r5 \
  --log runs/ns3d_full_r5.jsonl > runs/ns3d_full_r5.log 2>&1
echo "ns3d full rc=$?"
if ! grep -q '"test_' runs/ns3d_full_r5.jsonl; then
  timeout 2700 python -m uno_tpu.cli eval --preset ns3d_t40 \
    --ntrain 9000 --nval 1000 --ntest 1000 --batch-size 16 \
    --data-cache runs/ns3d_full_data.npz --checkpoint-dir runs/ns3d_full_r5 \
    --log runs/ns3d_full_r5_eval.jsonl > runs/ns3d_full_r5_eval.log 2>&1
  echo "ns3d standalone eval rc=$?"
fi
git add -f runs/ns3d_full_r5.jsonl runs/ns3d_full_r5.log runs/round5_master_chain.sh
git add -f runs/ns3d_full_r5_eval.jsonl runs/ns3d_full_r5_eval.log 2>/dev/null
git commit -m "NS-3D at the full 9000-trajectory reference dataset (evidence)"

# ---------------- leg B: NS-2D flagship at full trajectory count -------------
timeout -k 900 -s TERM 7800 python -m uno_tpu.cli train --preset ns2d --generate \
  --ntrain 4000 --nval 500 --ntest 500 --epochs 96 --dtype bfloat16 \
  --checkpoint-every 10 \
  --data-cache runs/ns2d_full_data.npz --checkpoint-dir runs/ns2d_full_r5 \
  --log runs/ns2d_full_r5.jsonl > runs/ns2d_full_r5.log 2>&1
echo "ns2d full rc=$?"
if ! grep -q '"test_' runs/ns2d_full_r5.jsonl; then
  timeout 2700 python -m uno_tpu.cli eval --preset ns2d \
    --ntrain 4000 --nval 500 --ntest 500 \
    --data-cache runs/ns2d_full_data.npz --checkpoint-dir runs/ns2d_full_r5 \
    --log runs/ns2d_full_r5_eval.jsonl > runs/ns2d_full_r5_eval.log 2>&1
  echo "ns2d standalone eval rc=$?"
fi
git add -f runs/ns2d_full_r5.jsonl runs/ns2d_full_r5.log
git add -f runs/ns2d_full_r5_eval.jsonl runs/ns2d_full_r5_eval.log 2>/dev/null
git commit -m "NS-2D flagship at the full 4000-trajectory reference count (evidence)"

# round-boundary hygiene (VERDICT r4 #8): nothing may outlive this chain
pgrep -f "uno_tpu.cli" && echo "WARNING: live cli process at chain end"
echo "chain done $(date)"
exit 0
