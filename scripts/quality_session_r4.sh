#!/usr/bin/env bash
# Round-4 quality session (VERDICT r3 missing #1/#2): fill the two open
# driver quality targets, serially on the single tunneled TPU:
#
#   1. neus_hash: neus-blender.yaml UNMODIFIED (HashGrid) at the full 20k
#      reference budget — the empty PERF.md row.  (~3 h)
#   2. neus_dtu: DTU-layout data through neus-dtu-wmask.yaml UNMODIFIED
#      (HashGrid), + chamfer — the DTU north-star row.  (~3 h)
#   3. neus_dtu_cp: same DTU pipeline with only the CP encoding override
#      (the parity-bearing flagship), + chamfer.  (~1 h)
#
# All run under the stall watchdog (tunnel fetches can hang forever);
# checkpoints every 1000 steps so a restart loses <1k steps. Stall window
# 1500 s > the ~9 min cold NeuS compile.
#
#   bash scripts/quality_session_r4.sh [data_root] [out_root]
#
# Prereq: python scripts/make_synthetic_data.py --out $data_root \
#             --format all --size 800 --n-train 40 --n-val 2

set -u
DATA="${1:-/root/repo/data}"
OUT="${2:-/root/repo/exp/quality_r4}"
cd "$(dirname "$0")/.."
mkdir -p "$OUT"
WD=scripts/run_with_watchdog.sh

run_arm() {  # name, then the launch.py args
  local name="$1"; shift
  echo "=== [$name] $(date +%H:%M:%S) ==="
  bash "$WD" "$OUT/$name.log" "$OUT/$name" 1500 30 \
    python launch.py "$@" \
      checkpoint.every_n_train_steps=1000 \
      --exp_dir "$OUT/$name"
  echo "[$name] watchdog exit=$? $(date +%H:%M:%S)"
  python scripts/eval_chamfer.py --exp_dir "$OUT/$name" \
    > "$OUT/$name.chamfer" 2>&1
  tail -2 "$OUT/$name.chamfer"
}

run_arm neus_hash --config configs/neus-blender.yaml --train \
  dataset.scene=procsphere "dataset.root_dir=$DATA/blender"

run_arm neus_dtu --config configs/neus-dtu-wmask.yaml --train \
  "dataset.root_dir=$DATA/dtu"

run_arm neus_dtu_cp --config configs/neus-dtu-wmask.yaml --train \
  "dataset.root_dir=$DATA/dtu" \
  model.geometry.xyz_encoding_config.otype=CP \
  model.geometry.xyz_encoding_config.n_components=64 \
  "model.geometry.xyz_encoding_config.resolutions=[128,2048]" \
  model.geometry.xyz_encoding_config.n_features=16

echo "=== done $(date +%H:%M:%S) ==="
grep -hE "val/psnr|val/ssim|test/psnr|test/ssim|chamfer" \
  "$OUT"/neus_hash.log "$OUT"/neus_dtu.log "$OUT"/neus_dtu_cp.log \
  2>/dev/null | tail -30
