#!/bin/bash
# Deliberate host-contention generator for the CPU-vs-wall budget A/B
# (VERDICT r18 #2): spins N busy-loop workers until killed, simulating
# the time-sliced windows this host drifts into intra-day (r17 binary:
# 107.6 s its own morning, 121.5 s the same evening). Run a bench with
# this active and wall inflates while per-query executor-CPU totals
# hold — the demonstration that budgets must evaluate on CPU.
#
# Usage: tools/cpu_hog.sh [workers]   (default 16; kill to stop)
N=${1:-16}
echo "cpu_hog: spinning $N workers (pid $$) — kill $$ to stop"
pids=()
for i in $(seq 1 "$N"); do
  (while :; do :; done) &
  pids+=($!)
done
trap 'kill "${pids[@]}" 2>/dev/null' EXIT INT TERM
wait
