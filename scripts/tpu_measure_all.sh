#!/usr/bin/env bash
# One-shot TPU measurement session for the round-2 fused-kernel layer.
# Run when the axon tunnel is up (probe first: the tunnel has multi-hour
# outages and jax.devices() hangs when it is down). Each stage appends to
# a timestamped log so a mid-session tunnel drop loses nothing.
#
#   bash scripts/tpu_measure_all.sh [logfile]
#
# Stages (PERF.md measurement plan):
#   1. microbench_fused   — fused kernels vs composed, kernel-level A/B
#   2. bench nerf         — headline rays/s (flagship cp)
#   3. bench nerf cp_stacked — stacked-scales A/B (MXU-width experiment)
#   4. bench neus         — NeuS rays/s (flagship cp)
#   5. profile_step       — step decomposition at the new operating point
#   6. bench eval mode    — full-image render throughput
# Keep the persistent compilation cache warm: every python entry here sets
# jax_compilation_cache_dir itself (bench.py, launch.py) or runs fast.

set -u
LOG="${1:-/tmp/tpu_measurements_$(date +%Y%m%d-%H%M%S).log}"
cd "$(dirname "$0")/.."

probe() {
  timeout 300 python -c "import jax; assert jax.devices()[0].platform != 'cpu', 'no TPU'; print(jax.devices())" \
    >>"$LOG" 2>&1
}

stage() {
  local name="$1"; shift
  echo "=== [$name] $(date +%H:%M:%S) ===" | tee -a "$LOG"
  if ! probe; then
    echo "[$name] SKIPPED — tunnel down at $(date +%H:%M:%S)" | tee -a "$LOG"
    return 1
  fi
  # shellcheck disable=SC2068
  timeout 3600 $@ >>"$LOG" 2>&1
  local rc=$?
  echo "[$name] exit=$rc" | tee -a "$LOG"
  tail -n 3 "$LOG"
  return 0
}

echo "log: $LOG"
stage microbench_fused python scripts/microbench_fused.py || exit 1
stage bench_nerf python bench.py --workload nerf
stage bench_nerf_stacked python bench.py --workload nerf --encoding cp_stacked
stage bench_neus python bench.py --workload neus
stage profile_step python scripts/profile_step.py
stage bench_eval python bench.py --workload nerf --mode eval
# quality at the flagship encoding: 10k steps on the procedural scene
# (round-1 hash evidence was val 34.3; CP must hold the quality bar too)
stage quality_cp python launch.py --config configs/nerf-synthetic.yaml --train \
  trainer.max_steps=10000 trainer.val_check_interval=5000 \
  model.geometry.xyz_encoding_config.otype=CP \
  model.geometry.xyz_encoding_config.n_components=64 \
  "model.geometry.xyz_encoding_config.resolutions=[128,2048]" \
  model.geometry.xyz_encoding_config.n_features=16 \
  --exp_dir /tmp/exp_quality_cp
echo "=== done $(date +%H:%M:%S) ===" | tee -a "$LOG"
