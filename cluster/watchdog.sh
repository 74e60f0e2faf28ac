#!/usr/bin/env bash
# Training watchdog: restart a run when its metrics stop advancing.
#
# The tunneled-TPU environment can wedge a client mid-RPC (the process
# stays alive but never dispatches again).  Training is preemption-tolerant
# by design (orbax checkpoints + --resume), so the robust recovery is:
# kill the wedged process and relaunch with --resume; it restores the last
# checkpoint and (with data.cache_generated=True) skips dataset rebuild.
#
# Usage:
#   cluster/watchdog.sh <pid_file> <metrics_jsonl> <config> <workdir> <log_prefix>
# Stop with: touch "$STOP_FILE" (default /tmp/iddiff_watchdog.stop)
set -u
PIDF=$1; METRICS=$2; CFG=$3; WD=$4; LOGP=$5
STOP_FILE=${STOP_FILE:-/tmp/iddiff_watchdog.stop}
STALL_S=${STALL_S:-480}
cd "$(dirname "$0")/.."
# reset the staleness clock at supervision start: the metrics file may be
# hours old from a previous round, which would otherwise kill a healthy
# process mid-startup (cache load + checkpoint restore + compile take
# minutes and write no metrics)
[ -f "$METRICS" ] && touch "$METRICS"
while true; do
  sleep 120
  [ -f "$STOP_FILE" ] && exit 0
  PID=$(cat "$PIDF" 2>/dev/null || true)
  ALIVE=0; [ -n "${PID:-}" ] && kill -0 "$PID" 2>/dev/null && ALIVE=1
  AGE=9999
  [ -f "$METRICS" ] && AGE=$(( $(date +%s) - $(stat -c %Y "$METRICS") ))
  if [ "$ALIVE" = "0" ] || [ "$AGE" -gt "$STALL_S" ]; then
    echo "$(date -u) watchdog: alive=$ALIVE stall_age=${AGE}s -> restart" \
        >> "${LOGP}_watchdog.log"
    [ -n "${PID:-}" ] && kill -9 "$PID" 2>/dev/null
    sleep 10
    nohup python -u main.py --config "$CFG" --mode train --workdir "$WD" \
        --resume > "${LOGP}_$(date -u +%H%M%S).log" 2>&1 &
    echo $! > "$PIDF"
    [ -f "$METRICS" ] && touch "$METRICS"  # restart resets the clock too
    sleep 600  # resume needs data + compile before metrics move again
  fi
done
