#!/bin/bash
# Round-4 results phase. Run AFTER pausing the training driver
# (touch logs/round4_pause; wait for the in-flight chunk to drain).
# Produces and COMMITS the round's deliverables so a reset cannot eat them
# (VERDICT r03 #10): docs/RD_RESULTS.md, multiview logs from trained
# weights, BENCH artifacts.
set -u
cd /root/repo
L=logs/round4_finalize.log
mkdir -p docs logs
run() { echo "=== $(date +%H:%M:%S) $*" | tee -a "$L"; "$@" >> "$L" 2>&1 || echo "EXIT $? $1" | tee -a "$L"; }

# 0. multiview fine-tune if the driver never reached its slot
if [ ! -d trained/mcvc_ia_office ]; then
  run python scripts/train_multiview.py --finetune --category office \
      --steps 400 --size 128 --gop 4 --lr 1e-4 \
      --ckpt pretrained_mcvc_ia_pt --out-ckpt trained/mcvc_ia_office
  git add -A trained logs >/dev/null 2>&1
  git commit -q -m "trained: MCVC-IA office multiview finetune (finalize)" || true
fi

# 1. multiview: per-category benchmark + OLFT bandwidth run from the
#    TRAINED checkpoint (train_multiview.py:487-604 equivalents)
if [ -d trained/mcvc_ia_office ]; then
  run python scripts/train_multiview.py --benchmark --category office \
      --size 128 --gop 4 --ckpt trained/mcvc_ia_office
  run python scripts/train_multiview.py --olft --category office \
      --steps 30 --size 128 --gop 4 --ckpt trained/mcvc_ia_office
fi

# 2. the RD deliverable (real rANS bitstreams, BD-rates, drift gates)
run python scripts/round4_results.py --gop 8 --clips 3 ${SKIP_ABL:+--skip-ablation}

git add -A docs logs 2>/dev/null
git commit -q -m "round 4: RD_RESULTS + multiview logs from trained weights" || true
echo "=== finalize done ==="
# (perf artifacts were produced in the mid-round window: docs/PERF_r04.log)
