#!/usr/bin/env bash
# Keep the watchdog from killing a HEALTHY trainer during a long startup
# (2 GB cache load + XLA compile can exceed STALL_S before the first
# metrics write).  Every 120 s: if the supervised pid's CPU jiffies
# advanced since the last check, touch the metrics file (the watchdog's
# staleness clock).  A wedged client (frozen jiffies — the tunnel failure
# mode) gets no touch, so the watchdog still recovers it.
#
# Usage: cluster/startup_guard.sh <pid_file> <metrics_jsonl>
set -u
PIDF=$1; METRICS=$2
STOP_FILE=${STOP_FILE:-/tmp/iddiff_watchdog.stop}
LAST_PID=""; LAST_J=0
while true; do
  sleep 120
  [ -f "$STOP_FILE" ] && exit 0
  PID=$(cat "$PIDF" 2>/dev/null || true)
  [ -n "${PID:-}" ] || continue
  J=$(awk '{print $14+$15}' "/proc/$PID/stat" 2>/dev/null || echo "")
  [ -n "$J" ] || continue
  if [ "$PID" = "$LAST_PID" ] && [ "$J" -gt "$LAST_J" ]; then
    touch "$METRICS"
  fi
  LAST_PID=$PID; LAST_J=$J
done
