#!/bin/bash
# TPU-outage watcher: probe the axon tunnel once every ~10 min (single
# short-lived probe per cycle -- a fast probe loop can wedge the claim,
# see CLAUDE.md "Round-4 late-session state").  When the tunnel answers,
# run the pending chip work queue (CLAUDE.md round-5 "STILL PENDING") in
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

# Remaining round-5 queue: the full bench refresh (the 22:19 UTC run was
# killed at session end after 9/10 rows; all printed rows were healthy --
# /tmp/chipwork/bench.log).  Pacing demos are DONE (rc=0, results in
# RESULTS.md "Real-time duty cycle").
run bench 2400 python bench.py
echo "$(date -u +%H:%M:%S) QUEUE COMPLETE" >> /tmp/chipwork/watch.log
