#!/usr/bin/env bash
# Poll the tunneled TPU until it answers; print when reachable.
# Usage: bash cluster/wait_relay.sh [max_seconds]
set -u
MAX=${1:-864000}
START=$(date +%s)
while true; do
  if timeout 60 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "RELAY UP at $(date -u)"
    exit 0
  fi
  NOW=$(date +%s)
  if [ $((NOW - START)) -ge "$MAX" ]; then
    echo "still down after ${MAX}s"
    exit 1
  fi
  sleep 240
done
