#!/usr/bin/env bash
# A/B of the adaptive-ratio guard on the full-IAN late-phase pathology
# (docs/REAL_TRAINING.md: FID bottoms ~50 at the epoch-50 lr drop, then
# drifts to ~130 while batch-16 minibatch discrimination pins D at acc
# 0.85-0.9). Three sequential chip runs:
#   1. faithful IAN to epoch 50 (runs/ian_ab_base) -- the shared prefix;
#   2. control leg 50->80, guard OFF (reproduces the drift);
#   3. guard leg 50->80, --adaptive-ratio-acc 0.8 (below the pinned
#      0.85-0.9 accuracy band, so the guard engages decisively on the
#      pathology while leaving a healthy sub-0.8 D alone).
# Both legs fork the SAME epoch-49 train state and FID basis, so the FID
# trajectories are directly comparable. Publish: docs/REAL_TRAINING.md.
set -eu
DATA="--dataset runs/composite/composite_train.npz --valid-dataset runs/composite/composite_valid.npz --num-examples 32768"
COMMON="--checkpoint-every 5 --state-every 1 --async-checkpoint --compute-dtype bfloat16"
BASE=runs/ian_ab_base

mkdir -p "$BASE"
STALL_DIR=$BASE STALL_TIMEOUT=2400 scripts/babysit_train.sh IAN \
  $DATA --max-epochs 50 --out-dir $BASE --pics-dir $BASE/pics $COMMON

for leg in ctrl guard; do
  d=runs/ian_ab_$leg
  rm -rf "$d"; mkdir -p "$d"
  cp $BASE/IAN.npz $BASE/IAN_train_state.npz $BASE/IAN_fid_basis.npz "$d/"
  cp $BASE/IANMETRICS.jsonl "$d/"
done

STALL_DIR=runs/ian_ab_ctrl STALL_TIMEOUT=2400 scripts/babysit_train.sh IAN \
  $DATA --max-epochs 80 --out-dir runs/ian_ab_ctrl --pics-dir runs/ian_ab_ctrl/pics $COMMON

STALL_DIR=runs/ian_ab_guard STALL_TIMEOUT=2400 scripts/babysit_train.sh IAN \
  $DATA --max-epochs 80 --out-dir runs/ian_ab_guard --pics-dir runs/ian_ab_guard/pics $COMMON \
  --adaptive-ratio-acc 0.8

echo "A/B complete"
