#!/usr/bin/env bash
# Auto-restarting trainer wrapper (elastic recovery for long runs).
#
# The remote-TPU tunnel (axon) can drop mid-run ("TPU backend connection
# dropped N times consecutively"), which kills the training process even
# though the run is fully resumable from its train-state checkpoint
# (npe_tpu/training/train.py --resume restores params + Adam moments +
# MADE masks + epoch/lr). This wrapper relaunches with --resume True until
# the trainer exits cleanly, giving the faithful multi-hour recipes
# (IAN_simple x 250 epochs, IAN x 80 epochs) crash tolerance the reference
# never had (its resume was manual, `train_IAN.py:423-428`).
#
# Usage: scripts/babysit_train.sh CONFIG [train.py args...]
# Env:   MAX_RESTARTS (default 20), RESTART_DELAY seconds (default 30).
set -u
CONFIG=$1; shift
MAX_RESTARTS=${MAX_RESTARTS:-20}
RESTART_DELAY=${RESTART_DELAY:-30}
n=0
while true; do
  python -m npe_tpu.training.train "$CONFIG" "$@" --resume True
  rc=$?
  if [ "$rc" -eq 0 ]; then
    echo "babysit: trainer finished cleanly"
    exit 0
  fi
  n=$((n + 1))
  if [ "$n" -ge "$MAX_RESTARTS" ]; then
    echo "babysit: giving up after $n restarts (last rc=$rc)"
    exit "$rc"
  fi
  echo "babysit: trainer exited rc=$rc; restart #$n in ${RESTART_DELAY}s"
  sleep "$RESTART_DELAY"
done
