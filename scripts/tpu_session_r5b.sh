#!/usr/bin/env bash
# Round-5 TPU window B (after tpu_session_r4b.sh finishes): the TRUE
# warm-cache 20k walls (VERDICT r4 missing #2). The first warm-walls run
# of round 5 paid fresh compiles (the round-5 march changes invalidated
# the persistent cache); this rerun hits the cache those runs populated.
# MUST run before any further march-touching code change.
#
#   bash scripts/tpu_session_r5b.sh

set -u
DATA=/root/repo/data
cd "$(dirname "$0")/.."
bash scripts/warm_walls_r4.sh "$DATA" /root/repo/exp/warm_walls_r5
echo "=== r5b done $(date +%H:%M:%S) ==="
grep -hE "fit_wall|train_wall" /root/repo/exp/warm_walls_r5/*.log
