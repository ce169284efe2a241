#!/usr/bin/env bash
# Stall-watchdog runner for long TPU training over the axon tunnel, whose
# known failure mode is an in-flight fetch that never returns (the process
# blocks forever with zero CPU). Restarts the command from its latest
# checkpoint when the log stops growing.
#
#   run_with_watchdog.sh <log> <exp_dir> <stall_secs> <max_restarts> cmd...
#
# cmd must be a launch.py invocation writing checkpoints under
# <exp_dir>/*/*/ckpt/ (pass checkpoint.every_n_train_steps=N so a stall
# loses at most N steps). On restart, --resume <latest ckpt> is appended.

set -u
LOG="$1"; EXP="$2"; STALL="$3"; MAXR="$4"; shift 4

tries=0
while :; do
  CK=$(ls -t "$EXP"/*/*/ckpt/*.npz 2>/dev/null | head -1)
  if [ -n "${CK:-}" ]; then
    echo "[watchdog] starting (resume $CK)" | tee -a "$LOG"
    "$@" --resume "$CK" >>"$LOG" 2>&1 &
  else
    echo "[watchdog] starting fresh" | tee -a "$LOG"
    "$@" >>"$LOG" 2>&1 &
  fi
  PID=$!
  # monitor: kill the exact child if the log is static for STALL seconds
  while kill -0 "$PID" 2>/dev/null; do
    sz0=$(stat -c %s "$LOG" 2>/dev/null || echo 0)
    slept=0
    while [ "$slept" -lt "$STALL" ] && kill -0 "$PID" 2>/dev/null; do
      sleep 30
      slept=$((slept + 30))
      sz1=$(stat -c %s "$LOG" 2>/dev/null || echo 0)
      [ "$sz1" != "$sz0" ] && break
    done
    if [ "$slept" -ge "$STALL" ] && kill -0 "$PID" 2>/dev/null; then
      sz1=$(stat -c %s "$LOG" 2>/dev/null || echo 0)
      if [ "$sz1" = "$sz0" ]; then
        echo "[watchdog] log static ${STALL}s — killing $PID" | tee -a "$LOG"
        kill "$PID" 2>/dev/null
        sleep 5
        kill -9 "$PID" 2>/dev/null
        break
      fi
    fi
  done
  wait "$PID"
  rc=$?
  if [ "$rc" -eq 0 ]; then
    echo "[watchdog] done rc=0" | tee -a "$LOG"
    exit 0
  fi
  tries=$((tries + 1))
  echo "[watchdog] rc=$rc try=$tries/$MAXR" | tee -a "$LOG"
  if [ "$tries" -ge "$MAXR" ]; then
    echo "[watchdog] giving up" | tee -a "$LOG"
    exit "$rc"
  fi
done
