#!/usr/bin/env bash
# Round-4 TPU window B (after tpu_session_r4a.sh): the remaining quality
# arms, serially under the stall watchdog:
#   1. neus_dtu: DTU-layout data through UNMODIFIED neus-dtu-wmask.yaml
#      (HashGrid) + chamfer — the DTU north-star row.  (~3 h)
#   2. warm-cache 20k walls (scripts/warm_walls_r4.sh).  (~1 h)
#   3. nerf_hash80: UNMODIFIED nerf-blender.yaml on the 80-view export —
#      the coverage-diagnosis confirmation arm + chamfer.  (~2 h)
#
#   bash scripts/tpu_session_r4b.sh

set -u
DATA=/root/repo/data
OUT=/root/repo/exp/quality_r4
cd "$(dirname "$0")/.."
WD=scripts/run_with_watchdog.sh

echo "=== [neus_dtu] $(date +%H:%M:%S) ==="
bash "$WD" "$OUT/neus_dtu.log" "$OUT/neus_dtu" 1500 30 \
  python launch.py --config configs/neus-dtu-wmask.yaml --train \
    "dataset.root_dir=$DATA/dtu" \
    checkpoint.every_n_train_steps=1000 \
    --exp_dir "$OUT/neus_dtu"
echo "[neus_dtu] exit=$? $(date +%H:%M:%S)"
python scripts/eval_chamfer.py --exp_dir "$OUT/neus_dtu" \
  > "$OUT/neus_dtu.chamfer" 2>&1
tail -2 "$OUT/neus_dtu.chamfer"

echo "=== [warm_walls] $(date +%H:%M:%S) ==="
bash scripts/warm_walls_r4.sh "$DATA" /root/repo/exp/warm_walls_r4

echo "=== [nerf_hash80] $(date +%H:%M:%S) ==="
bash "$WD" "$OUT/nerf_hash80.log" "$OUT/nerf_hash80" 1500 30 \
  python launch.py --config configs/nerf-blender.yaml --train \
    dataset.scene=procsphere "dataset.root_dir=/root/repo/data80/blender" \
    checkpoint.every_n_train_steps=1000 \
    --exp_dir "$OUT/nerf_hash80"
echo "[nerf_hash80] exit=$? $(date +%H:%M:%S)"
python scripts/eval_chamfer.py --exp_dir "$OUT/nerf_hash80" \
  > "$OUT/nerf_hash80.chamfer" 2>&1
tail -2 "$OUT/nerf_hash80.chamfer"

echo "=== done $(date +%H:%M:%S) ==="
