#!/bin/bash
# Round-4 training driver (single real TPU chip via the axon tunnel).
#
# VERDICT.md round-3 items this schedule answers:
#  #2 ladder separation: the DVC ladder moves to levels [0,2,4,6]
#     (lambda 256/1024/4096/16384, a 64x span — the warm-started
#     256..2048 ladder only separated 1.45x in rate) with l4/l6 seeded
#     from the trained l3.
#  #1/#3 LSVC quality: REC chunks continue all round (the lost round-3a
#     run proved 0.17 bpp @ 34 dB by ~24k steps; committed state is 3.8k).
#  #8 the MS-SSIM operating point: a DVC-M ladder (lambda [8,16,32,64],
#     loss_type M) warm-started from the PSNR ladder.
#  #7 multiview: a full-model multiview fine-tune of MCVC-IA from the
#     views=1 pretrain.
#
# Discipline (round-3 reset lesson, MEMORY.md): train into git-tracked
# trained/, commit after every chunk.
#
# Control: touch logs/round4_pause  -> the driver idles at the next chunk
#        boundary until the file is removed (frees the chip for benches).
#        ROUND4_DEADLINE=<epoch>  -> no new chunk starts after this time.
#        WAIT_PID=<pid>           -> wait for an in-flight trainer first.
set -u
cd /root/repo
mkdir -p logs trained
L=logs/round4_train.log
echo "pid $$" > logs/round4_train.pid
DEADLINE=${ROUND4_DEADLINE:-$(( $(date +%s) + 20400 ))}

run() { echo "=== $(date +%H:%M:%S) $*" >> "$L"; "$@" >> "$L" 2>&1; }
pause_gate() { while [ -f logs/round4_pause ]; do sleep 20; done; }
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

newest_ckpt() {  # newest ckpt_N dir under $1, by N
  ls -d "$1"/ckpt_* | awk -F_ '{print $NF, $0}' | sort -n | tail -1 \
    | cut -d" " -f2
}

# ---- drain any in-flight round-3b trainer, then commit its output ----
if [ -n "${WAIT_PID:-}" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 15; done
  commit_weights "trained: drained in-flight round3b chunk"
fi

# ---- one-time seeding ----
if [ ! -d trained/dvc_ladder_l4 ]; then
  for lvl in 4 6; do
    src=$(newest_ckpt trained/dvc_ladder_l3)
    mkdir -p "trained/dvc_ladder_l$lvl"
    cp -r "$src" "trained/dvc_ladder_l$lvl/$(basename "$src")"
  done
  echo "=== $(date +%H:%M:%S) seeded dvc l4/l6 from l3" >> "$L"
fi
if [ ! -d trained/dvc_m_l0 ]; then
  for lvl in 0 1 2 3; do
    src=$(newest_ckpt "trained/dvc_ladder_l$lvl")
    mkdir -p "trained/dvc_m_l$lvl"
    cp -r "$src" "trained/dvc_m_l$lvl/$(basename "$src")"
  done
  echo "=== $(date +%H:%M:%S) seeded dvc_m ladder from PSNR ladder" >> "$L"
  commit_weights "trained: seed wide DVC ladder (l4,l6) + DVC-M ladder"
fi

# ---- main loop: LSVC every chunk; extras rotate ----
i=0
while time_left; do
  i=$((i+1)); pause_gate
  run python scripts/train.py --codec LSVC --ladder 0,1,2,3 --steps 2000 \
      --gop 6 --crop 256 --stage REC \
      --ckpt trained/lsvc_ladder --ckpt-every 1000 --log-every 100 \
      --lr-final 1e-5 --lr-decay-steps 25000
  commit_weights "trained: LSVC REC r4 chunk $i"
  pause_gate; time_left || break
  case $i in
    1|3|5|7|9)
      run python scripts/train.py --codec DVC --ladder 0,2,4,6 --steps 700 \
          --gop 4 --crop 256 \
          --ckpt trained/dvc_ladder --ckpt-every 350 --log-every 50 \
          --lr 1e-4 --lr-final 1e-5 --lr-decay-steps 9000
      commit_weights "trained: DVC wide ladder r4 chunk $i"
      ;;
    2|4|6)
      run python scripts/train.py --codec DVC --ladder 0,1,2,3 --loss-type M \
          --steps 500 --gop 4 --crop 256 \
          --ckpt trained/dvc_m --ckpt-every 250 --log-every 50 \
          --lr 1e-4 --lr-final 1e-5 --lr-decay-steps 6000
      commit_weights "trained: DVC-M ladder r4 chunk $i"
      ;;
    8)
      run python scripts/train_multiview.py --finetune --category office \
          --steps 600 --size 128 --gop 4 --lr 1e-4 \
          --ckpt pretrained_mcvc_ia_pt --out-ckpt trained/mcvc_ia_office
      commit_weights "trained: MCVC-IA office multiview finetune"
      ;;
  esac
done
echo "=== $(date +%H:%M:%S) round4 training driver done (i=$i)" >> "$L"
