#!/usr/bin/env bash
# Round-4 TPU measurement window A (run when the TPU is otherwise idle):
#   1. hash-arm dedup A/B (VERDICT r3 #5): bench the unmodified-hash NeRF
#      workload with per-group tap dedup OFF vs ON
#   2. fresh production-step trace of the CP flagship (tail breakdown for
#      VERDICT r3 #4)
#
#   bash scripts/tpu_session_r4a.sh [out_dir]

set -u
OUT="${1:-/root/repo/runs/r4a}"
cd "$(dirname "$0")/.."
mkdir -p "$OUT"

echo "=== [1/5] nerf hash bench, dedup OFF $(date +%H:%M:%S) ==="
INSR_DISABLE_HASH_DEDUP=1 timeout 2400 python bench.py \
  --workload nerf --encoding hash > "$OUT/bench_hash_nodedup.log" 2>&1
grep -h '"metric"' "$OUT/bench_hash_nodedup.log" | tail -2

echo "=== [2/5] nerf hash bench, dedup ON $(date +%H:%M:%S) ==="
timeout 2400 python bench.py \
  --workload nerf --encoding hash > "$OUT/bench_hash_dedup.log" 2>&1
grep -h '"metric"' "$OUT/bench_hash_dedup.log" | tail -2

echo "=== [3/5] neus hash bench, dedup OFF $(date +%H:%M:%S) ==="
INSR_DISABLE_HASH_DEDUP=1 timeout 2400 python bench.py \
  --workload neus --encoding hash > "$OUT/bench_neus_hash_nodedup.log" 2>&1
grep -h '"metric"' "$OUT/bench_neus_hash_nodedup.log" | tail -2

echo "=== [4/5] neus hash bench, dedup ON $(date +%H:%M:%S) ==="
timeout 2400 python bench.py \
  --workload neus --encoding hash > "$OUT/bench_neus_hash_dedup.log" 2>&1
grep -h '"metric"' "$OUT/bench_neus_hash_dedup.log" | tail -2

echo "=== [5/5] CP flagship trace $(date +%H:%M:%S) ==="
timeout 2400 python scripts/trace_step.py --workload nerf \
  --outdir "$OUT/trace_nerf" > "$OUT/trace_nerf.log" 2>&1
tail -40 "$OUT/trace_nerf.log"

echo "=== done $(date +%H:%M:%S) ==="
