#!/usr/bin/env bash
# Keep the watchdog from killing a HEALTHY trainer during a long startup
# (2 GB cache load + XLA compile can exceed STALL_S before the first
# metrics write).  Every 120 s: if the supervised pid's CPU jiffies
# advanced since the last check, touch the metrics file (the watchdog's
# staleness clock).
#
# The guard stands DOWN for a pid once that pid has written a metrics
# entry (startup is over): a wedged tunnel client still accumulates a few
# jiffies per minute from background threads (heartbeats/logging), so
# "jiffies advanced" is NOT a liveness signal mid-training — only the
# metrics file is.  Guarding past startup masked a 2 h full hang from the
# watchdog (observed 1 jiffy/30 s at 0 steps/s).  On pid change (watchdog
# restart) the guard re-arms.
#
# Usage: cluster/startup_guard.sh <pid_file> <metrics_jsonl>
set -u
PIDF=$1; METRICS=$2
STOP_FILE=${STOP_FILE:-/tmp/iddiff_watchdog.stop}
LAST_PID=""; LAST_J=0; SEEN_AT=0
while true; do
  sleep 120
  [ -f "$STOP_FILE" ] && exit 0
  PID=$(cat "$PIDF" 2>/dev/null || true)
  [ -n "${PID:-}" ] || continue
  if [ "$PID" != "$LAST_PID" ]; then
    SEEN_AT=$(date +%s)   # new supervised process: re-arm
    LAST_PID=$PID; LAST_J=0
  fi
  # startup over for this pid? (its newest metrics entry postdates it)
  LAST_T=$(tail -1 "$METRICS" 2>/dev/null | python3 -c '
import sys, json
try:
    print(int(json.loads(sys.stdin.read())["time"]))
except Exception:
    print(0)' 2>/dev/null || echo 0)
  if [ "${LAST_T:-0}" -gt "$SEEN_AT" ]; then
    continue  # trainer is writing metrics; the watchdog clock is live
  fi
  J=$(awk '{print $14+$15}' "/proc/$PID/stat" 2>/dev/null || echo "")
  [ -n "$J" ] || continue
  if [ "$LAST_J" != "0" ] && [ "$J" -gt "$LAST_J" ]; then
    touch "$METRICS"
  fi
  LAST_J=$J
done
