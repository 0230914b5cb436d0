#!/usr/bin/env bash
# Build + run the evaluation harness in the deployment container.
# (The reference's deploy/start.sh + docker-compose equivalent; TPU VMs need
# --privileged for /dev/accel access.)
set -euo pipefail
cd "$(dirname "$0")/.."

IMAGE=mcmh-localization-tpu
docker build -f deploy/Dockerfile -t "$IMAGE" .
docker run --rm --privileged \
    -v "$(pwd)/results:/opt/mcmh/results" \
    "$IMAGE" "$@"
