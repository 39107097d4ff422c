#!/bin/bash
# Round-5 training driver (single real TPU chip via the axon tunnel).
#
# The round-5 premise (VERDICT r04): every RD claim moves to the HARD
# synthetic corpus (fvc/data/datasets.py SyntheticVideoDataset profile
# 'hard' — fractal textures, affine global+local motion, occluders,
# photometric drift, sensor noise). All ladders therefore FINE-TUNE from
# their round-4 checkpoints onto the new content with a restarted cosine
# schedule, and every ladder now tracks an EMA (Polyak) eval copy under
# trained/*_ema_l{level} (VERDICT r04 weak #3).
#
# Schedule, most-valuable-first (VERDICT r04 "next round" #1-#3, #6):
#  - LSVC REC chunks every rotation (headline claim: BD-rate vs DVC < 0).
#  - DVC wide ladder [0,2,4,6] at gop 7 in two half-ladder runs (the
#    4-level vmapped gop-7 backward OOMs HBM — measured r4); gop-7
#    training is what turns the GOP-8 drift gate green.
#  - DVC-M ladder extended to 6 levels [8..256] (split halves), stable
#    recipe lr 1e-5 + clip 1.0.
#  - One MCVC-IA multiview fine-tune on the hard corpus.
#
# Discipline (MEMORY/ROUND4_NOTES): train into git-tracked trained/,
# commit after every chunk; builder touches the chip ONLY inside
# logs/round5_pause windows.
#
# Control: touch logs/round5_pause  -> idle at the next chunk boundary.
#          ROUND5_DEADLINE=<epoch>  -> no new chunk starts after this.
#          WAIT_PID=<pid>           -> drain an in-flight trainer first.
set -u
cd /root/repo
mkdir -p logs trained
L=logs/round5_train.log
echo "pid $$" > logs/round5_train.pid
DEADLINE=${ROUND5_DEADLINE:-$(( $(date +%s) + 21000 ))}

run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$L"
  "$@" >> "$L" 2>&1
  local rc=$?
  [ $rc -ne 0 ] && echo "=== $(date +%H:%M:%S) EXIT $rc: $1 $2 $3 $4" >> "$L"
  return 0
}
pause_gate() { while [ -f logs/round5_pause ]; do sleep 20; done; }
time_left() { [ "$(date +%s)" -lt "$DEADLINE" ]; }

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
  git add -A trained logs >/dev/null 2>&1
  git commit -q -m "$1" || true
}

newest_ckpt() {
  ls -d "$1"/ckpt_* | awk -F_ '{print $NF, $0}' | sort -n | tail -1 \
    | cut -d" " -f2
}

if [ -n "${WAIT_PID:-}" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 15; done
  commit_weights "trained: drained in-flight chunk"
fi

# ---- one-time: seed the two new M-ladder levels from l3 ----
if [ ! -d trained/dvc_m_l4 ]; then
  for lvl in 4 5; do
    src=$(newest_ckpt trained/dvc_m_l3)
    mkdir -p "trained/dvc_m_l$lvl"
    cp -r "$src" "trained/dvc_m_l$lvl/$(basename "$src")"
  done
  echo "=== $(date +%H:%M:%S) seeded dvc_m l4/l5 from l3" >> "$L"
  commit_weights "trained: seed extended DVC-M ladder (l4,l5)"
fi

i=0
while time_left; do
  i=$((i+1)); pause_gate
  run python scripts/train.py --codec LSVC --ladder 0,1,2,3 --steps 2000 \
      --gop 6 --crop 256 --stage REC --corpus hard \
      --ckpt trained/lsvc_ladder --ckpt-every 1000 --log-every 100 \
      --lr 6e-5 --lr-final 1e-5 --lr-decay-steps 50000
  commit_weights "trained: LSVC REC r5 chunk $i (hard corpus)"
  pause_gate; time_left || break
  case $i in
    1|3|5|7|9|11|13)
      for HALF in 0,2 4,6; do
        run python scripts/train.py --codec DVC --ladder "$HALF" --steps 400 \
            --gop 7 --crop 256 --corpus hard \
            --ckpt trained/dvc_ladder --ckpt-every 200 --log-every 50 \
            --lr 6e-5 --lr-final 1e-5 --lr-decay-steps 20000
      done
      commit_weights "trained: DVC wide ladder r5 chunk $i (gop7 split, hard corpus)"
      ;;
    2|6|10)
      for HALF in 0,1,2 3,4,5; do
        run python scripts/train.py --codec DVC --ladder "$HALF" \
            --loss-type M --steps 300 --gop 4 --crop 256 --clip-norm 1.0 \
            --corpus hard \
            --ckpt trained/dvc_m --ckpt-every 150 --log-every 50 \
            --lr 1e-5 --lr-final 2e-6 --lr-decay-steps 10000
      done
      commit_weights "trained: DVC-M extended ladder r5 chunk $i (hard corpus)"
      ;;
    4)
      run python scripts/train_multiview.py --finetune --category office \
          --steps 600 --size 128 --gop 4 --lr 1e-4 --corpus hard \
          --ckpt trained/mcvc_ia_office --out-ckpt trained/mcvc_ia_office_r5
      commit_weights "trained: MCVC-IA office multiview finetune r5 (hard corpus)"
      ;;
  esac
done
echo "=== $(date +%H:%M:%S) round5 training driver done (i=$i)" >> "$L"
