#!/bin/bash
# TPU-outage watcher: probe the axon tunnel once every ~10 min (single
# short-lived probe per cycle -- a fast probe loop can wedge the claim,
# see CLAUDE.md "Round-4 late-session state").  When the tunnel answers,
# run the pending chip work queue (CLAUDE.md "PENDING CHIP WORK") in
# priority order, logging each step to /tmp/chipwork/.
set -u
mkdir -p /tmp/chipwork
cd /root/repo

probe() {
  timeout 120 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
print('PROBE_OK', float((x @ x).sum()))
" >/tmp/chipwork/probe.log 2>&1
  grep -q PROBE_OK /tmp/chipwork/probe.log
}

echo "$(date -u +%H:%M:%S) watcher start" >> /tmp/chipwork/watch.log
while true; do
  if probe; then
    echo "$(date -u +%H:%M:%S) TPU UP -- starting chip queue" >> /tmp/chipwork/watch.log
    break
  fi
  echo "$(date -u +%H:%M:%S) tpu still down" >> /tmp/chipwork/watch.log
  sleep 600
done

run() {  # run <tag> <timeout_s> <cmd...>
  local tag=$1 tmo=$2; shift 2
  echo "$(date -u +%H:%M:%S) START $tag" >> /tmp/chipwork/watch.log
  timeout "$tmo" "$@" > "/tmp/chipwork/$tag.log" 2>&1
  echo "$(date -u +%H:%M:%S) DONE $tag rc=$?" >> /tmp/chipwork/watch.log
}

# 1. Full kidnap cycle at 1M through the staged runner (130 s tour).
run kidnap_seed0 1800 python scripts/kidnap_1m.py 1000000 0 /tmp/chipwork/kidnap_cycle_s0.png
# 2. Theta-window pricing at the real operating points (flagship switch gate).
run mb27 1800 python scripts/microbench27.py
# 3. Spatial-window pricing at the staged SMALL operating point.
run mb28 1800 python scripts/microbench28.py
echo "$(date -u +%H:%M:%S) QUEUE COMPLETE" >> /tmp/chipwork/watch.log
