#!/bin/bash
# Round-3b training driver (single real TPU chip via the axon tunnel).
#
# Context: the round-3 ladder checkpoints lived in gitignored ckpts/ and were
# lost when the container reset between driver sessions. This driver trains
# into trained/ (git-tracked) and COMMITS the weights after every chunk so a
# reset can never lose more than one chunk again.
#
# Schedule (time-sliced for a short session, most-valuable-first):
#   1. DVC ladder WARM-STARTED from the committed 20k-step level-2 parent
#      (pretrained_dvc_l2, 33 dB @ 0.044 bpp GOP-8 real bits) — all 4 levels
#      seeded from the same near-equilibrium parent, separated by the
#      per-level lambda [256..2048] + independent per-level data sampling
#      (fvc/train/ladder.py samples a different clip per level per step,
#      which breaks the Adam sign-descent degeneracy of ROUND1_NOTES).
#   2. LSVC ladder from scratch with pretrained-SpyNet init and the
#      reference's staged WP -> MC -> REC schedule (models.py:70,1408).
set -u
cd /root/repo
mkdir -p logs trained
L=logs/round3b_train.log
echo "pid $$" > logs/round3b_train.pid
SPY=/root/reference/DVC/flow_pretrain_np/

run() { echo "=== $(date +%H:%M:%S) $*" >> "$L"; "$@" >> "$L" 2>&1; }

prune() {
  # keep only the 2 newest ckpt_N per level dir (rollback target + latest)
  python3 - <<'PY'
import os, shutil
root = "trained"
for d in (sorted(os.listdir(root)) if os.path.isdir(root) else []):
    p = os.path.join(root, d)
    if not os.path.isdir(p):
        continue
    cks = sorted((c for c in os.listdir(p) if c.startswith("ckpt_")),
                 key=lambda c: int(c.split("_")[1]))
    for c in cks[:-2]:
        shutil.rmtree(os.path.join(p, c))
PY
}

commit_weights() {
  prune
  git add -A trained logs/round3b_train.log >/dev/null 2>&1
  git commit -q -m "$1" || true
}

# ---- seed DVC ladder levels from the committed level-2 parent ----
if [ ! -d trained/dvc_ladder_l0 ]; then
  for i in 0 1 2 3; do
    mkdir -p "trained/dvc_ladder_l$i"
    cp -r pretrained_dvc_l2 "trained/dvc_ladder_l$i/ckpt_0"
  done
  echo "=== $(date +%H:%M:%S) seeded dvc ladder from pretrained_dvc_l2" >> "$L"
fi

# ---- chunk 1: DVC warm ladder, 700 steps ----
run python scripts/train.py --codec DVC --ladder 0,1,2,3 --steps 700 \
    --gop 4 --crop 256 --ckpt trained/dvc_ladder --ckpt-every 350 \
    --log-every 50 --lr 1e-4 --lr-final 1e-5 --lr-decay-steps 2800
commit_weights "trained: DVC warm ladder chunk (step $(date +%H%M))"

# ---- LSVC staged pretrain: WP then MC ----
if [ ! -d trained/lsvc_ladder_l0 ]; then
  run python scripts/train.py --codec LSVC --ladder 0,1,2,3 --steps 400 \
      --gop 6 --crop 256 --stage WP --spynet-npy "$SPY" \
      --ckpt trained/lsvc_ladder --ckpt-every 400 --log-every 50
  run python scripts/train.py --codec LSVC --ladder 0,1,2,3 --steps 400 \
      --gop 6 --crop 256 --stage MC \
      --ckpt trained/lsvc_ladder --ckpt-every 400 --log-every 50
  commit_weights "trained: LSVC WP+MC staged pretrain"
fi

# ---- interleaved REC chunks (LSVC) + DVC continuation ----
for i in 1 2 3 4 5 6 7 8 9 10; do
  run python scripts/train.py --codec LSVC --ladder 0,1,2,3 --steps 1500 \
      --gop 6 --crop 256 --stage REC \
      --ckpt trained/lsvc_ladder --ckpt-every 750 --log-every 100 \
      --lr-final 1e-5 --lr-decay-steps 12000
  commit_weights "trained: LSVC REC chunk $i"
  if [ "$i" -le 3 ]; then
    run python scripts/train.py --codec DVC --ladder 0,1,2,3 --steps 700 \
        --gop 4 --crop 256 --ckpt trained/dvc_ladder --ckpt-every 350 \
        --log-every 50 --lr 1e-4 --lr-final 1e-5 --lr-decay-steps 2800
    commit_weights "trained: DVC warm ladder chunk $((i+1))"
  fi
done
echo "=== $(date +%H:%M:%S) round3b training driver done" >> "$L"
