#!/bin/bash
# Round-4 perf window: run with the training driver PAUSED
# (touch logs/round4_pause and wait for the in-flight chunk to drain).
# All outputs append to docs/PERF_r04.log; JSON lines also land in
# docs/BENCH_family_r04.jsonl via bench_family's own writer.
set -u
cd /root/repo
L=docs/PERF_r04.log
mkdir -p docs
run() { echo "=== $(date +%H:%M:%S) $*" >> "$L"; "$@" >> "$L" 2>&1; }

# 1. headline bench, current defaults (scatter-free tree, s2d=2 SpyNet)
run python bench.py --iters 4

# 2. headline with s2d=4 SpyNet packing
FVC_SPYNET_S2D=4 run python bench.py --fast --iters 4

# 3. family benches (bf16 end-to-end; SSF/ELFVC-SP at their 2048x1024
#    reference setting is bench_family's default workload)
run python scripts/bench_family.py --iters 3

# 4. per-stage device time at the headline resolution (meter taxonomy)
run python scripts/profile_stages.py --gop 6 --height 640 --width 960 --iters 3

echo "=== $(date +%H:%M:%S) perf window done" >> "$L"
