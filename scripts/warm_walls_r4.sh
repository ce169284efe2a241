#!/usr/bin/env bash
# Warm-cache 20k wall-clock measurement (VERDICT r3 #7): with the
# persistent compile cache pre-populated (round-3/4 runs), rerun the two
# CP flagship arms at the full reference budget and record measured walls
# (the trainer logs train/fit_wall_secs + train/train_wall_secs).
# Targets to beat: RTX 3090 walls 4:42 (NeRF) / 11:44 (NeuS w/mask)
# (reference README.md:99-100).
#
#   bash scripts/warm_walls_r4.sh [data_root] [out_root]

set -u
DATA="${1:-/root/repo/data}"
OUT="${2:-/root/repo/exp/warm_walls_r4}"
cd "$(dirname "$0")/.."
mkdir -p "$OUT"
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
  grep -hE "fit_wall|train_wall|val/psnr|test/psnr" "$OUT/$name.log" | tail -6
}

run_arm nerf_cp_warm configs/nerf-blender.yaml
run_arm neus_cp_warm configs/neus-blender.yaml

echo "=== done $(date +%H:%M:%S) ==="
grep -hE "fit_wall|train_wall" "$OUT"/*.log
