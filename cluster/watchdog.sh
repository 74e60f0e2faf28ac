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
# Slow-rate guard (MIN_RATE steps/s, 0 = off): a tunnel client can survive
# a relay outage in a degraded state — alive, metrics advancing, but each
# RPC ~2s instead of ~10ms (observed 0.46 steps/s vs 110 steps/s for the
# SAME program in a fresh process).  If the rate measured from the two
# newest metric entries stays below MIN_RATE for 3 consecutive ticks, the
# process is recycled.  Only entries written in the last 300s count, so a
# freshly restarted run (old slow entries still in the file) or an
# eval/checkpoint pause never trips the guard.
MIN_RATE=${MIN_RATE:-0}
SLOW_TICKS=0
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
  # Startup-phase hang detection: a fresh process that has written NO
  # metrics yet (newest entry predates the process) can wedge in its
  # first device RPC (client CPU frozen, all threads in futex/poll —
  # observed twice on 2026-08-20, plus the 2h blobs hang).  Healthy
  # startups deliver first metrics in <=16 min (blobs history: 520-950s),
  # so recycle startup hangs after STARTUP_STALL_S instead of STALL_S.
  STARTUP_STALL_S=${STARTUP_STALL_S:-1200}
  if [ "$ALIVE" = "1" ] && [ -f "/proc/$PID/stat" ]; then
    # true process start time: /proc/<pid>/stat field 22 (starttime, in
    # clock ticks since boot) + btime — procfs inode mtimes are not a
    # reliable start proxy (advisor r4 low #3)
    STT=$(awk '{print $22}' "/proc/$PID/stat" 2>/dev/null)
    BTIME=$(awk '/^btime/{print $2}' /proc/stat)
    HZ=$(getconf CLK_TCK 2>/dev/null || echo 100)
    PSTART=$(( BTIME + STT / HZ ))
    PAGE=$(( $(date +%s) - PSTART ))
    LASTM=0
    [ -f "$METRICS" ] && LASTM=$(tail -1 "$METRICS" | sed -n 's/.*"time": \([0-9]*\)\..*/\1/p')
    LASTM=${LASTM:-0}
    if [ "$LASTM" -lt "$PSTART" ] && [ "$PAGE" -gt "$STARTUP_STALL_S" ]; then
      # debounce: a transient metrics-parse failure yields LASTM=0 for one
      # tick; require 2 consecutive ticks before recycling
      STARTUP_TICKS=$(( ${STARTUP_TICKS:-0} + 1 ))
      if [ "$STARTUP_TICKS" -ge 2 ]; then
        AGE=$((STALL_S + 1))  # force the restart branch below
        echo "$(date -u) watchdog: startup hang (proc age ${PAGE}s, no metrics from this process)" \
            >> "${LOGP}_watchdog.log"
      fi
    else
      STARTUP_TICKS=0
    fi
  fi
  SLOW=0
  if [ "$MIN_RATE" != "0" ] && [ "$ALIVE" = "1" ] && [ -f "$METRICS" ]; then
    RATE=$(tail -8 "$METRICS" | python3 -c '
import sys, json, time
try:
    L = [json.loads(l) for l in sys.stdin if l.strip()]
except Exception:
    L = []
# use the last two entries with DISTINCT steps: epoch ends write an eval
# line at the same step as the last train line, which would read as
# rate=0 and (after 3 quiet ticks of eval + spectrum probe + checkpoint
# save) kill a healthy trainer — observed 2026-08-20 16:54, cost 9k steps
last = L[-1] if L else None
prev = next((e for e in reversed(L[:-1])
             if last and e["step"] != last["step"]), None)
if last and prev and last["time"] > prev["time"] and \
        time.time() - last["time"] < 300:
    print((last["step"] - prev["step"]) / (last["time"] - prev["time"]))
else:
    print("")' 2>/dev/null)
    if [ -n "${RATE:-}" ] && \
        awk -v r="$RATE" -v m="$MIN_RATE" 'BEGIN{exit !(r<m)}'; then
      SLOW_TICKS=$((SLOW_TICKS + 1))
      [ "$SLOW_TICKS" -ge 3 ] && SLOW=1
    else
      SLOW_TICKS=0
    fi
  fi
  if [ "$ALIVE" = "0" ] || [ "$AGE" -gt "$STALL_S" ] || [ "$SLOW" = "1" ]; then
    echo "$(date -u) watchdog: alive=$ALIVE stall_age=${AGE}s slow=$SLOW (rate=${RATE:-n/a}, min=$MIN_RATE) -> restart" \
        >> "${LOGP}_watchdog.log"
    SLOW_TICKS=0
    # SIGTERM first: main.py converts it to a clean SystemExit that closes
    # the TPU session (RESULTS.md round 5 — a SIGKILLed client leaves a
    # stale session the server reaps only after ~9-10 min, during which
    # the relaunched process blocks in its first device RPC)
    if [ -n "${PID:-}" ]; then
      kill "$PID" 2>/dev/null
      for _ in $(seq 1 20); do
        kill -0 "$PID" 2>/dev/null || break
        sleep 2
      done
      kill -9 "$PID" 2>/dev/null
    fi
    sleep 10
    nohup python -u main.py --config "$CFG" --mode train --workdir "$WD" \
        --resume > "${LOGP}_$(date -u +%H%M%S).log" 2>&1 &
    echo $! > "$PIDF"
    [ -f "$METRICS" ] && touch "$METRICS"  # restart resets the clock too
    sleep 600  # resume needs data + compile before metrics move again
  fi
done
