#!/usr/bin/env bash
# Auto-restarting trainer wrapper (elastic recovery for long runs).
#
# The remote-TPU tunnel (axon) can fail mid-run in two ways, both observed
# during the faithful full-length recipes:
#   1. An error: "TPU backend connection dropped N times consecutively" --
#      the process dies (resumable).
#   2. A silent hang: the TCP connection to the tunnel vanishes and the
#      client blocks forever in a socket read, making no progress and
#      raising nothing.
# Both are recoverable from the train-state checkpoint
# (npe_tpu/training/train.py --resume restores params + Adam moments +
# MADE masks + epoch/lr), so this wrapper (a) relaunches with --resume True
# whenever the trainer exits nonzero, and (b) kills a trainer whose output
# directory has gone STALL_TIMEOUT seconds without any file activity (case
# 2 -- legitimate quiet periods during big checkpoint fetches run ~15 min,
# so the default is 30 min). This gives the multi-hour recipes crash
# tolerance the reference never had (its resume was manual,
# `train_IAN.py:423-428`).
#
# Usage: STALL_DIR=runs/x scripts/babysit_train.sh CONFIG [train.py args...]
# Env:   MAX_RESTARTS (default 20), RESTART_DELAY seconds (default 30),
#        STALL_DIR (out-dir to watch; stall detection off when unset),
#        STALL_TIMEOUT seconds (default 1800).
set -u
CONFIG=$1; shift
MAX_RESTARTS=${MAX_RESTARTS:-20}
RESTART_DELAY=${RESTART_DELAY:-30}
STALL_DIR=${STALL_DIR:-}
STALL_TIMEOUT=${STALL_TIMEOUT:-1800}

newest_mtime() {
  find "$STALL_DIR" -type f -printf '%T@\n' 2>/dev/null | sort -n | tail -1 | cut -d. -f1
}

n=0
while true; do
  python -m npe_tpu.training.train "$CONFIG" "$@" --resume True &
  pid=$!
  start=$(date +%s)
  stalled=0
  if [ -n "$STALL_DIR" ]; then
    while kill -0 "$pid" 2>/dev/null; do
      sleep 60
      last=$(newest_mtime)
      now=$(date +%s)
      # Clock stall time from max(newest file activity, THIS trainer's
      # start): a resumed run's out-dir files can be hours old while the
      # trainer is legitimately still in its 5-10 min first compile --
      # measuring from stale mtimes killed a resume in a restart loop.
      if [ -z "${last:-}" ] || [ "$last" -lt "$start" ]; then
        last=$start
      fi
      if [ $((now - last)) -gt "$STALL_TIMEOUT" ]; then
        echo "babysit: no file activity in $STALL_DIR for $((now - last))s; killing $pid"
        kill "$pid" 2>/dev/null
        sleep 10
        kill -9 "$pid" 2>/dev/null
        stalled=1
      fi
    done
  fi
  wait "$pid"
  rc=$?
  if [ "$rc" -eq 0 ] && [ "$stalled" -eq 0 ]; then
    echo "babysit: trainer finished cleanly"
    exit 0
  fi
  n=$((n + 1))
  if [ "$n" -ge "$MAX_RESTARTS" ]; then
    echo "babysit: giving up after $n restarts (last rc=$rc)"
    exit "$rc"
  fi
  echo "babysit: trainer exited rc=$rc (stalled=$stalled); restart #$n in ${RESTART_DELAY}s"
  sleep "$RESTART_DELAY"
done
