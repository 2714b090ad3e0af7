#!/usr/bin/env bash
# Deadline janitor for the round-3 full-length training runs: at $1 seconds
# from launch, stop the babysitters + trainers (by recorded PID only), let
# the chip drain, harvest artifacts into docs/assets, and commit them.
# Backstop for the builder session ending mid-run: the driver's end-of-round
# bench.py must find the TPU idle, and the run evidence must be in git.
set -u
DELAY=${1:-1500}
sleep "$DELAY"
cd /root/repo
for pidfile in /tmp/ian80.pid /tmp/simple250.pid; do
  [ -f "$pidfile" ] || continue
  bpid=$(cat "$pidfile")
  for child in $(pgrep -P "$bpid" 2>/dev/null); do
    kill "$child" 2>/dev/null
  done
  kill "$bpid" 2>/dev/null
  sleep 2
  for child in $(pgrep -P "$bpid" 2>/dev/null); do
    kill -9 "$child" 2>/dev/null
  done
  kill -9 "$bpid" 2>/dev/null
done
sleep 20
JAX_PLATFORMS=cpu python scripts/harvest_run.py runs/ian80 IAN --tag ian_80ep > /tmp/harvest_ian.txt 2>&1
JAX_PLATFORMS=cpu python scripts/harvest_run.py runs/simple250 IAN_simple --tag ian_simple_250ep > /tmp/harvest_simple.txt 2>&1
git add docs/assets scripts/janitor_stop_runs.sh 2>/dev/null
git commit -q -m "Harvest full-length run artifacts at session deadline

Janitor-stopped the faithful recipes (babysitter PIDs only; TPU left idle
for the driver bench) and committed the metric streams, grids, and curve
figures produced so far.

No-Verification-Needed: doc assets + ops script only, no product behavior" 2>/dev/null
echo "janitor done $(date)" >> /tmp/janitor.log
