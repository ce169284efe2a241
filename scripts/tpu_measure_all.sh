#!/usr/bin/env bash
# One-shot TPU measurement session (round-3 shape). Run when the axon
# tunnel is up (probe first: the tunnel has multi-hour outages and
# jax.devices() hangs when it is down). Each stage appends to a
# timestamped log so a mid-session tunnel drop loses nothing.
#
#   bash scripts/tpu_measure_all.sh [logfile]
#
# Stages:
#   1. microbench_fused — fused kernels vs composed, kernel-level A/B
#   2. bench            — BOTH workloads (neus line, then the nerf
#                         headline) with the 3-arm fused A/B
#   3. bench hash arms  — the reference HashGrid configs (gather floor)
#   4. trace_step       — device-trace op breakdown of the real step
#   5. bench eval mode  — full-image render throughput
# For the 20k-step quality table run scripts/quality_session.sh instead.
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
stage bench_both python bench.py
stage bench_nerf_hash python bench.py --workload nerf --encoding hash --no-ab
stage bench_neus_hash python bench.py --workload neus --encoding hash --no-ab
stage trace_step python scripts/trace_step.py --workload nerf --steps 16
stage bench_eval python bench.py --workload nerf --mode eval
echo "=== done $(date +%H:%M:%S) ===" | tee -a "$LOG"
