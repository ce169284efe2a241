#!/usr/bin/env bash
# Round-3 quality session (VERDICT task 4): the full reference budget —
# 20k steps, reference hyperparameters, exporter-generated 800x800
# blender-layout scene, through the UNMODIFIED reference configs — for
# both model families, CP vs hash A/B, held-out PSNR/SSIM + exported-mesh
# chamfer vs the analytic scene surface.
#
#   bash scripts/quality_session.sh [data_root] [out_root]
#
# Prereq: python scripts/make_synthetic_data.py --out $data_root \
#             --format blender --size 800 --n-train 40 --n-val 2
# Arms (fast CP arms first so a mid-session tunnel drop loses the least):
#   1. nerf-blender.yaml + CP encoding override  (~10 min)
#   2. neus-blender.yaml + CP encoding override  (~15 min)
#   3. nerf-blender.yaml UNMODIFIED (HashGrid)   (~2 h)
#   4. neus-blender.yaml UNMODIFIED (HashGrid)   (~3 h)
# After each: chamfer of the exported mesh via scripts/eval_chamfer.py.

set -u
DATA="${1:-/tmp/nsr_data}"
OUT="${2:-/tmp/exp_quality_r3}"
LOG="$OUT/session.log"
cd "$(dirname "$0")/.."
mkdir -p "$OUT"
echo "log: $LOG"

COMMON_NERF=(--config configs/nerf-blender.yaml --train
  dataset.scene=procsphere "dataset.root_dir=$DATA/blender")
COMMON_NEUS=(--config configs/neus-blender.yaml --train
  dataset.scene=procsphere "dataset.root_dir=$DATA/blender")
CP_OVR=(model.geometry.xyz_encoding_config.otype=CP
  model.geometry.xyz_encoding_config.n_components=64
  "model.geometry.xyz_encoding_config.resolutions=[128,2048]"
  model.geometry.xyz_encoding_config.n_features=16)

stage() {
  local name="$1"; shift
  echo "=== [$name] $(date +%H:%M:%S) ===" | tee -a "$LOG"
  timeout 21600 "$@" >>"$LOG" 2>&1
  echo "[$name] exit=$? $(date +%H:%M:%S)" | tee -a "$LOG"
}

chamfer() {
  local name="$1" dir="$2"
  stage "chamfer_$name" python scripts/eval_chamfer.py --exp_dir "$dir"
}

stage nerf_cp python launch.py "${COMMON_NERF[@]}" "${CP_OVR[@]}" \
  --exp_dir "$OUT/nerf_cp"
chamfer nerf_cp "$OUT/nerf_cp"

stage neus_cp python launch.py "${COMMON_NEUS[@]}" "${CP_OVR[@]}" \
  --exp_dir "$OUT/neus_cp"
chamfer neus_cp "$OUT/neus_cp"

stage nerf_hash python launch.py "${COMMON_NERF[@]}" --exp_dir "$OUT/nerf_hash"
chamfer nerf_hash "$OUT/nerf_hash"

stage neus_hash python launch.py "${COMMON_NEUS[@]}" --exp_dir "$OUT/neus_hash"
chamfer neus_hash "$OUT/neus_hash"

echo "=== done $(date +%H:%M:%S) ===" | tee -a "$LOG"
grep -E "val/psnr|val/ssim|test/psnr|test/ssim|chamfer" "$LOG" | tail -40
