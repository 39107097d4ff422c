#!/bin/bash
# Round-5 results phase. Run AFTER pausing the training driver
# (touch logs/round5_pause; wait for the in-flight chunk to drain).
# Produces and COMMITS the round's deliverables so a reset cannot eat them:
# docs/RD_RESULTS.md on the HARD corpus from the EMA ladders, multiview
# benchmark + the FIXED OLFT record (joint psnr+bandwidth; the r4 OLFT
# adapted a random init — VERDICT r04 weak #5).
set -u
cd /root/repo
L=logs/round5_finalize.log
mkdir -p docs logs
run() { echo "=== $(date +%H:%M:%S) $*" | tee -a "$L"; "$@" >> "$L" 2>&1 || echo "EXIT $? $1" | tee -a "$L"; }

# 0. pick the freshest multiview checkpoint
MV_CKPT=trained/mcvc_ia_office
[ -d trained/mcvc_ia_office_r5 ] && MV_CKPT=trained/mcvc_ia_office_r5

# 1. multiview: benchmark + OLFT bandwidth/psnr run from the TRAINED
#    checkpoint (train_multiview.py:487-604 equivalents, hard corpus)
run python scripts/train_multiview.py --benchmark --category office \
    --size 128 --gop 4 --ckpt "$MV_CKPT"
run python scripts/train_multiview.py --olft --category office \
    --steps 30 --size 128 --gop 4 --lr 1e-5 --ckpt "$MV_CKPT"

# 1b. ELFVC-SP per-stage SoL table (VERDICT r04 #8 "Done" clause)
run bash -c "python scripts/profile_elfvc.py --codec ELFVC-SP-HR --pyramid >> docs/PERF_r05.log 2>&1"

# 2. the RD deliverable (real rANS bitstreams on the hard corpus, EMA
#    ladders, BD-rates, drift gates, provenance steps)
run python scripts/round5_results.py --gop 8 --clips 3 ${SKIP_ABL:+--skip-ablation}

git add -A docs logs 2>/dev/null
git commit -q -m "round 5: RD_RESULTS (hard corpus, EMA ladders) + multiview logs from trained weights" || true
echo "=== finalize done ==="
