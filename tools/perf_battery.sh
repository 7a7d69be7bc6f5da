#!/bin/bash
# Full TPU measurement battery (run when the chip is reachable).
# Usage: bash tools/perf_battery.sh [outdir]   (default /tmp/perf_battery)
# Each step is bounded and appends to $OUT/summary.txt; order is
# cheapest-first so partial runs still yield the headline numbers.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/perf_battery}
mkdir -p "$OUT"
S="$OUT/summary.txt"
echo "=== perf battery $(date -u) ===" | tee -a "$S"

run() { # name timeout cmd...
  local name=$1 to=$2; shift 2
  echo "--- $name ---" | tee -a "$S"
  timeout "$to" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  tail -5 "$OUT/$name.log" | tee -a "$S"
  echo "(rc=$rc)" | tee -a "$S"
}

# headline: 4-scale e2e scenes/s (the driver's metric)
run bench_4scale 1800 python bench.py
# perf ladder (VERDICT #3)
run bench_3scale 1800 python bench.py --config fcaf3d_scannet_3scales
run bench_2scale 1800 python bench.py --config fcaf3d_scannet_2scales
# batch scaling (the round-2 batch>1 regression)
run bench_b8 1800 python bench.py --batch 8 --iters 5
# traced breakdown, batch 1 and 8
run trace_b1 1800 python tools/trace_forward.py --dir "$OUT/tr1"
run trace_b8 2400 python tools/trace_forward.py --batch 8 --iters 2 --dir "$OUT/tr8"
# training throughput (fwd+bwd+update)
run train_b16 3600 python tools/bench_train.py --steps 4 --warmup 1
run train_votenet 3600 python tools/bench_train.py --config votenet_sunrgbd --steps 4 --warmup 1
# tile autotune on real kernel maps (slowest; last)
run autotune 3600 python tools/autotune_tiles.py --grid small
echo "=== done $(date -u) ===" | tee -a "$S"
