#!/usr/bin/env bash
# Round-4 quality session (VERDICT r3 missing #1/#2): fill the two open
# driver quality targets, serially on the single tunneled TPU:
#
#   1. neus_hash: neus-blender.yaml UNMODIFIED (HashGrid) at the full 20k
#      reference budget — the empty PERF.md row.  (~3 h)
#   2. neus_dtu_cp: DTU-layout data through the UNMODIFIED
#      neus-dtu-wmask.yaml pipeline with only the CP encoding override
#      (the parity-bearing flagship), + chamfer.  (~1 h)
#
# Both run under the stall watchdog (tunnel fetches can hang forever);
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

echo "=== [neus_hash] $(date +%H:%M:%S) ==="
bash "$WD" "$OUT/neus_hash.log" "$OUT/neus_hash" 1500 30 \
  python launch.py --config configs/neus-blender.yaml --train \
    dataset.scene=procsphere "dataset.root_dir=$DATA/blender" \
    checkpoint.every_n_train_steps=1000 \
    --exp_dir "$OUT/neus_hash"
echo "[neus_hash] watchdog exit=$? $(date +%H:%M:%S)"
python scripts/eval_chamfer.py --exp_dir "$OUT/neus_hash" \
  > "$OUT/neus_hash.chamfer" 2>&1
tail -2 "$OUT/neus_hash.chamfer"

echo "=== [neus_dtu_cp] $(date +%H:%M:%S) ==="
bash "$WD" "$OUT/neus_dtu_cp.log" "$OUT/neus_dtu_cp" 1500 30 \
  python launch.py --config configs/neus-dtu-wmask.yaml --train \
    "dataset.root_dir=$DATA/dtu" \
    model.geometry.xyz_encoding_config.otype=CP \
    model.geometry.xyz_encoding_config.n_components=64 \
    "model.geometry.xyz_encoding_config.resolutions=[128,2048]" \
    model.geometry.xyz_encoding_config.n_features=16 \
    checkpoint.every_n_train_steps=1000 \
    --exp_dir "$OUT/neus_dtu_cp"
echo "[neus_dtu_cp] watchdog exit=$? $(date +%H:%M:%S)"
python scripts/eval_chamfer.py --exp_dir "$OUT/neus_dtu_cp" \
  > "$OUT/neus_dtu_cp.chamfer" 2>&1
tail -2 "$OUT/neus_dtu_cp.chamfer"

echo "=== done $(date +%H:%M:%S) ==="
grep -hE "val/psnr|val/ssim|test/psnr|test/ssim|chamfer" \
  "$OUT"/neus_hash.log "$OUT"/neus_dtu_cp.log 2>/dev/null | tail -20
