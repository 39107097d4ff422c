#!/bin/bash
# Round-5 session-C training driver (final window before the round-5
# finalize). Same discipline as scripts/round5_train.sh: commit after
# every chunk, pause flag logs/round5_pause, ROUND5_DEADLINE stops new
# chunks. Schedule for the remaining ~1h of chip time, most-valuable
# first (VERDICT r04 next-round #1, #3; plus the MCVC-IA hard-corpus
# finetune the i=4 rotation never reached):
#   1. LSVC REC 2000 steps  (headline BD-rate claim)
#   2. MCVC-IA office finetune 600 steps (finalize benchmarks this ckpt)
#   3. DVC wide ladder [0,2]+[4,6] gop-7 halves (drift gate)
#   4. loop LSVC until deadline
set -u
cd /root/repo
mkdir -p logs trained
L=logs/round5_train.log
echo "pid $$" > logs/round5_train.pid
DEADLINE=${ROUND5_DEADLINE:-$(( $(date +%s) + 3600 ))}

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

lsvc_chunk() {
  run python scripts/train.py --codec LSVC --ladder 0,1,2,3 --steps 2000 \
      --gop 6 --crop 256 --stage REC --corpus hard \
      --ckpt trained/lsvc_ladder --ckpt-every 1000 --log-every 100 \
      --lr 6e-5 --lr-final 1e-5 --lr-decay-steps 50000
  commit_weights "trained: LSVC REC r5 chunk $1 (hard corpus)"
}

pause_gate; lsvc_chunk 3

pause_gate
if time_left && [ ! -d trained/mcvc_ia_office_r5 ]; then
  run python scripts/train_multiview.py --finetune --category office \
      --steps 600 --size 128 --gop 4 --lr 1e-4 --corpus hard \
      --ckpt trained/mcvc_ia_office --out-ckpt trained/mcvc_ia_office_r5
  commit_weights "trained: MCVC-IA office multiview finetune r5 (hard corpus)"
fi

pause_gate
if time_left; then
  for HALF in 0,2 4,6; do
    pause_gate
    run python scripts/train.py --codec DVC --ladder "$HALF" --steps 300 \
        --gop 7 --crop 256 --corpus hard \
        --ckpt trained/dvc_ladder --ckpt-every 200 --log-every 50 \
        --lr 6e-5 --lr-final 1e-5 --lr-decay-steps 20000
  done
  commit_weights "trained: DVC wide ladder r5 chunk 3 (gop7 split, hard corpus)"
fi

i=3
while time_left; do
  i=$((i+1)); pause_gate; lsvc_chunk $i
done
echo "=== $(date +%H:%M:%S) round5c training driver done (i=$i)" >> "$L"
