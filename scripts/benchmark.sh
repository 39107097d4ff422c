#!/usr/bin/env bash
# Benchmark driver — reference benchmark.sh equivalent: sweep codecs/levels
# through eval + the chip bench + the QoE sim.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== per-chip encode+decode throughput (bench.py) =="
python bench.py --gop 6 --iters 3

echo "== RD eval sweep (synthetic data) =="
for codec in LSVC DVC ELFVC; do
  for level in 1 2; do
    python scripts/eval.py --codec "$codec" --level "$level" --synthetic \
      --gop 8 --max-gops 2 || true
  done
done

echo "== QoE simulation =="
python scripts/simulate.py --traces 10
