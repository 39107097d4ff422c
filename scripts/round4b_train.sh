#!/bin/bash
# Round-4b training driver — replaces round4_train.sh after two findings:
#  1. The DVC-M ladder (MS-SSIM loss, lambda [8,16,32,64]) EXPLODES when
#     fine-tuned from the PSNR parent at lr 1e-4 unclipped (observed:
#     PSNR -> 3 dB, bpp -> 5, rollback thrashing within 350 steps): the
#     loss surface changes under the model and the first unclipped Adam
#     steps blow it up. M chunks now run --lr 1e-5 --clip-norm 1.0.
#  2. run() now logs exit codes, so a RESOURCE_EXHAUSTED chunk is visible
#     in the driver log instead of looking like a silent skip.
# Control: touch logs/round4_pause -> idle at the next chunk boundary;
#          ROUND4_DEADLINE=<epoch> -> no new chunk after this time;
#          WAIT_PID=<pid> -> drain an in-flight trainer first.
set -u
cd /root/repo
mkdir -p logs trained
L=logs/round4_train.log
echo "pid $$" > logs/round4b_train.pid
DEADLINE=${ROUND4_DEADLINE:-$(( $(date +%s) + 17100 ))}

run() {
  echo "=== $(date +%H:%M:%S) $*" >> "$L"
  "$@" >> "$L" 2>&1
  local rc=$?
  [ $rc -ne 0 ] && echo "=== $(date +%H:%M:%S) EXIT $rc: $1 $2 $3 $4" >> "$L"
  return 0
}
pause_gate() { while [ -f logs/round4_pause ]; do sleep 20; done; }
time_left() { [ "$(date +%s)" -lt "$DEADLINE" ]; }

prune() {
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

# ---- one-time: reset the blown-up M ladder to fresh PSNR-parent seeds ----
if [ ! -f trained/.dvc_m_reseeded ]; then
  for lvl in 0 1 2 3; do
    rm -rf "trained/dvc_m_l$lvl"
    src=$(newest_ckpt "trained/dvc_ladder_l$lvl")
    mkdir -p "trained/dvc_m_l$lvl"
    cp -r "$src" "trained/dvc_m_l$lvl/$(basename "$src")"
  done
  touch trained/.dvc_m_reseeded
  echo "=== $(date +%H:%M:%S) reseeded dvc_m ladder from PSNR ladder" >> "$L"
  commit_weights "trained: reseed DVC-M ladder after lr-1e-4 blowup"
fi

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
    1|4|6|8)
      # gop 7: error-propagation training — the GOP-8 eval drift gate
      # (plot_hermes.py:814-831, VERDICT r03 #9) needs the scan to expose
      # degraded references as deep as eval reads them. SPLIT ladder: the
      # 4-level vmapped gop-7 backward OOMs HBM (measured EXIT 1,
      # AllocateBuffer 224M); two half-ladders fit.
      for HALF in 0,2 4,6; do
        run python scripts/train.py --codec DVC --ladder "$HALF" --steps 400 \
            --gop 7 --crop 256 \
            --ckpt trained/dvc_ladder --ckpt-every 200 --log-every 50 \
            --lr 1e-4 --lr-final 1e-5 --lr-decay-steps 9000
      done
      commit_weights "trained: DVC wide ladder r4 chunk $i (gop7 split)"
      ;;
    2|5|7)
      run python scripts/train.py --codec DVC --ladder 0,1,2,3 --loss-type M \
          --steps 500 --gop 4 --crop 256 --clip-norm 1.0 \
          --ckpt trained/dvc_m --ckpt-every 250 --log-every 50 \
          --lr 1e-5 --lr-final 1e-6 --lr-decay-steps 6000
      commit_weights "trained: DVC-M ladder r4 chunk $i"
      ;;
    3)
      run python scripts/train_multiview.py --finetune --category office \
          --steps 600 --size 128 --gop 4 --lr 1e-4 \
          --ckpt pretrained_mcvc_ia_pt --out-ckpt trained/mcvc_ia_office
      commit_weights "trained: MCVC-IA office multiview finetune"
      ;;
  esac
done
echo "=== $(date +%H:%M:%S) round4b training driver done (i=$i)" >> "$L"
