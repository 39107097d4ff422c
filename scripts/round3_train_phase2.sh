#!/bin/bash
# Phase 2: DVC ladder is already non-dominated (ckpt_11000) — concentrate the
# remaining chip time on the MS-SSIM point (once) and the LSVC ladder.
set -u
cd /root/repo
L=logs/round3_train.log
echo "pid $$" > logs/round3_train.pid
pw() { while [ -f .train_pause ]; do sleep 20; done; }
run() { echo "=== $(date +%H:%M:%S) $*" >> "$L"; "$@" >> "$L" 2>&1; }

if [ ! -d ckpts/dvc_m_l1 ]; then
  pw; run python scripts/train.py --codec DVC --loss-type M --level 1 \
      --steps 2500 --gop 4 --crop 256 \
      --ckpt ckpts/dvc_m_l1 --ckpt-every 1250 --log-every 100
fi
for i in 1 2 3 4 5 6 7 8; do
  pw; run python scripts/train.py --codec LSVC --ladder 0,1,2,3 --steps 2500 \
      --gop 6 --crop 256 --stage REC \
      --ckpt ckpts/lsvc_ladder --ckpt-every 1250 --log-every 100 \
      --lr-final 1e-5 --lr-decay-steps 18000
done
echo "=== $(date +%H:%M:%S) phase2 done" >> "$L"
