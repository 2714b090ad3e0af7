#!/usr/bin/env bash
# Round-4 resume of the two faithful full-length recipes (VERDICT r3
# missing #2), run SEQUENTIALLY so the single TPU chip is never contended
# (the round-3 train-bench instability was chip contention from concurrent
# runs). Writes its own PID to /tmp/full_runs.pid and each babysitter's to
# /tmp/<run>.pid so a janitor can stop by recorded PID only.
set -u
cd /root/repo
echo $$ > /tmp/full_runs.pid

run_one() {
  local name=$1 cfg=$2 epochs=$3 ckpt=$4
  echo "=== $(date) resuming $name to epoch $epochs ==="
  STALL_DIR=runs/$name STALL_TIMEOUT=2400 scripts/babysit_train.sh "$cfg" \
    --dataset runs/composite/composite_train.npz \
    --valid-dataset runs/composite/composite_valid.npz \
    --max-epochs "$epochs" --num-examples 32768 \
    --out-dir runs/$name --pics-dir runs/$name/pics \
    --checkpoint-every "$ckpt" --state-every 2 --async-checkpoint \
    --compute-dtype bfloat16 &
  echo $! > /tmp/$name.pid
  wait $!
  echo "=== $(date) $name finished rc=$? ==="
  rm -f /tmp/$name.pid
}

run_one simple250 IAN_simple 250 25 >> /tmp/simple250.log 2>&1
run_one ian80 IAN 80 10 >> /tmp/ian80.log 2>&1
rm -f /tmp/full_runs.pid
echo "all full-length runs complete $(date)"
