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

# 1. Real-time duty-cycle demo (VERDICT r4 item 8): 100k single-program
#    online config, then the recommended 1M staged config, 60 s each.
run pacing_100k 1200 python scripts/pacing_demo.py 100000 60
run pacing_1m_staged 1800 python scripts/pacing_demo.py 1000000 60 --staged
# 2. Full bench refresh after the headline switch (validates every row
#    prints and the staged settle assert passes on chip).
run bench 2400 python bench.py
echo "$(date -u +%H:%M:%S) QUEUE COMPLETE" >> /tmp/chipwork/watch.log
