#!/bin/bash
# Round-3 training driver (single real TPU chip via the axon tunnel).
#
# Goal (VERDICT r02 #1): trained, non-dominated RD ladders for the flagship
# LSVC (staged WP -> MC -> REC, pretrained SpyNet init, reference stage
# schedule models.py:70,1408) and the DVC ladder continued past its round-2
# state with cosine lr decay; plus one MS-SSIM (loss_type M) DVC point
# (VERDICT #6, reference [8,16,32,64] ladder models.py:72-76).
#
# Chunked so progress lands in checkpoints every <=2000 steps; touch
# /root/repo/.train_pause to make the driver idle between chunks (frees the
# chip for benches), rm it to resume.
set -u
cd /root/repo
mkdir -p logs
echo "pid $$" > logs/round3_train.pid
SPY=/root/reference/DVC/flow_pretrain_np/
L=logs/round3_train.log

pw() { while [ -f .train_pause ]; do sleep 20; done; }
run() { echo "=== $(date +%H:%M:%S) $*" >> "$L"; "$@" >> "$L" 2>&1; }

# ---- LSVC staged pretrain: WP (warp loss), then MC (motion-comp loss) ----
if [ ! -d ckpts/lsvc_ladder_l0 ]; then
  pw; run python scripts/train.py --codec LSVC --ladder 0,1,2,3 --steps 700 \
      --gop 6 --crop 256 --stage WP --spynet-npy "$SPY" \
      --ckpt ckpts/lsvc_ladder --ckpt-every 700 --log-every 50
  pw; run python scripts/train.py --codec LSVC --ladder 0,1,2,3 --steps 700 \
      --gop 6 --crop 256 --stage MC \
      --ckpt ckpts/lsvc_ladder --ckpt-every 700 --log-every 50
fi

# ---- interleaved REC chunks: LSVC ladder + DVC ladder continuation ----
for i in 1 2 3 4 5 6 7 8; do
  pw; run python scripts/train.py --codec LSVC --ladder 0,1,2,3 --steps 2000 \
      --gop 6 --crop 256 --stage REC \
      --ckpt ckpts/lsvc_ladder --ckpt-every 1000 --log-every 100 \
      --lr-final 1e-5 --lr-decay-steps 15000
  if [ "$i" -le 3 ]; then
    pw; run python scripts/train.py --codec DVC --ladder 0,1,2,3 --steps 1500 \
        --gop 4 --crop 256 \
        --ckpt ckpts/dvc_ladder --ckpt-every 1500 --log-every 100 \
        --lr-final 8e-6 --lr-decay-steps 14000
  fi
  if [ "$i" -eq 4 ]; then
    # MS-SSIM operating point: DVC level 1 of the [8,16,32,64] M ladder
    pw; run python scripts/train.py --codec DVC --loss-type M --level 1 \
        --steps 2500 --gop 4 --crop 256 \
        --ckpt ckpts/dvc_m_l1 --ckpt-every 1250 --log-every 100
  fi
done
echo "=== $(date +%H:%M:%S) round3 training driver done" >> "$L"
