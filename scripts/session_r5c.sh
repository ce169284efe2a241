#!/usr/bin/env bash
# Round-5 session C: regenerate the warm-cache 20k wall evidence after the
# between-session workspace reset wiped the untracked exp/ tree (see
# evidence/README.md). Runs the unmodified-budget CP flagship arms through
# launch.py twice for NeRF (cold compile pass populates the persistent
# cache, the second pass is the measured WARM wall), then NeuS as wall
# budget allows, and copies compact tracked evidence into evidence/r5/.
#
#   bash scripts/session_r5c.sh [nerf_cold|nerf_warm|neus_cold|neus_warm]

set -u
DATA=/root/repo/data
OUT=/root/repo/exp/warm_walls_r5c
EV=/root/repo/evidence/r5
cd "$(dirname "$0")/.."
mkdir -p "$OUT" "$EV"
WD=scripts/run_with_watchdog.sh

CP_OVR=(model.geometry.xyz_encoding_config.otype=CP
  model.geometry.xyz_encoding_config.n_components=64
  "model.geometry.xyz_encoding_config.resolutions=[128,2048]"
  model.geometry.xyz_encoding_config.n_features=16)

run_arm() {
  local name="$1" config="$2"; shift 2
  echo "=== [$name] $(date +%H:%M:%S) ==="
  bash "$WD" "$OUT/$name.log" "$OUT/$name" 1500 10 \
    python launch.py --config "$config" --train \
      dataset.scene=procsphere "dataset.root_dir=$DATA/blender" \
      "${CP_OVR[@]}" "$@" \
      --exp_dir "$OUT/$name"
  echo "[$name] exit=$? $(date +%H:%M:%S)"
  # compact tracked evidence: log tail + all wall/psnr/ssim metric lines
  mkdir -p "$EV/$name"
  tail -n 120 "$OUT/$name.log" > "$EV/$name/log_tail.txt"
  grep -hE "fit_wall|train_wall|val/psnr|test/psnr|val/ssim|test/ssim" \
    "$OUT/$name.log" > "$EV/$name/metrics.txt" || true
  find "$OUT/$name" -name "*.csv" -exec cp {} "$EV/$name/" \; 2>/dev/null
}

case "${1:-all}" in
  nerf_cold) run_arm nerf_cp_cold configs/nerf-blender.yaml ;;
  nerf_warm) run_arm nerf_cp_warm configs/nerf-blender.yaml ;;
  neus_cold) run_arm neus_cp_cold configs/neus-blender.yaml ;;
  neus_warm) run_arm neus_cp_warm configs/neus-blender.yaml ;;
  all)
    run_arm nerf_cp_cold configs/nerf-blender.yaml
    run_arm nerf_cp_warm configs/nerf-blender.yaml
    run_arm neus_cp_cold configs/neus-blender.yaml
    run_arm neus_cp_warm configs/neus-blender.yaml
    ;;
esac
echo "=== r5c done $(date +%H:%M:%S) ==="
grep -hE "fit_wall|train_wall" "$OUT"/*.log
