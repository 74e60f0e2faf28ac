#!/usr/bin/env bash
# Round-4 chip sequencing, revision b (replaces chip_plan_r4.sh — the
# squares checkpoint was lost to a host rebuild, and the flash-attention
# decision benchmark still needs the chip):
#   1. wait until blobs-10 reaches its 120k budget (watchdog keeps it
#      alive across relay outages/client wedges)
#   2. stop the blobs watchdog+trainer, run the 50-point blobs estimate,
#      archive the spectra pickle
#   2.5 run scripts/check_flash_attn.py on the now-idle chip (the
#      end-to-end number that decides the attention default)
#   3. restart squares-10 from scratch (500k budget; the rebuilt
#      cluster/runs/squares10_resume.py no longer needs the wiped
#      config.pkl) under a fresh watchdog
# Safe to restart: phases are guarded by on-disk state (metrics step,
# archived artifacts, live pidfiles), so a rerun skips completed work.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/chip_plan.log
echo "$(date -u) chip_plan_r4b start" >> "$LOG"

rm -f "${STOP_FILE:-/tmp/iddiff_watchdog.stop}"

last_step() {
  [ -f "$1" ] || { echo 0; return; }
  tail -1 "$1" | sed -n 's/.*"step": \([0-9]*\).*/\1/p'
}

alive() {
  local P
  P=$(cat "$1" 2>/dev/null) || return 1
  [ -n "$P" ] && kill -0 "$P" 2>/dev/null
}

kill_wait() {
  local P
  P=$(cat "$1" 2>/dev/null) || return 0
  [ -n "$P" ] || return 0
  kill "$P" 2>/dev/null
  for _ in $(seq 1 10); do
    kill -0 "$P" 2>/dev/null || return 0
    sleep 2
  done
  kill -9 "$P" 2>/dev/null
  for _ in $(seq 1 10); do
    kill -0 "$P" 2>/dev/null || return 0
    sleep 2
  done
  echo "$(date -u) chip_plan: WARNING pid $P from $1 survived kill -9" >> "$LOG"
  return 1
}

BLOBS_METRICS=logs/blobs_paper/10/metrics.jsonl
TARGET=119999

# ---- phase 1: wait for blobs to finish its budget -------------------------
while true; do
  S=$(last_step "$BLOBS_METRICS"); S=${S:-0}
  if [ "$S" -ge "$TARGET" ]; then break; fi
  if ! alive /tmp/blobs10_watchdog.pid; then
    echo "$(date -u) chip_plan: blobs watchdog dead at step $S -> revive" >> "$LOG"
    STALL_S=1800 nohup bash cluster/watchdog.sh /tmp/blobs10.pid \
      "$BLOBS_METRICS" cluster/runs/blobs10_run.py logs/blobs_paper/10 \
      /tmp/blobs10 > /tmp/blobs10_watchdog.out 2>&1 &
    echo $! > /tmp/blobs10_watchdog.pid
  fi
  sleep 300
done
echo "$(date -u) chip_plan: blobs reached $S" >> "$LOG"

# ---- phase 2: stop blobs, run the 50-point estimate ------------------------
kill_wait /tmp/blobs10_watchdog.pid
kill_wait /tmp/blobs10.pid
FINAL=$(last_step "$BLOBS_METRICS")
ART="artifacts/blobs10_trajectory/estimate50_steps_${FINAL}.pkl"
if [ -f "$ART" ]; then
  echo "$(date -u) chip_plan: estimate artifact $ART exists -> skip" >> "$LOG"
else
  timeout 7200 python -u main.py --config cluster/runs/blobs10_estimate.py \
    --mode manifold_dimension --workdir logs/blobs_paper/10 \
    > /tmp/blobs10_estimate.log 2>&1
  RC=$?
  echo "$(date -u) chip_plan: blobs estimate rc=$RC" >> "$LOG"
  NEW=$(ls -t logs/blobs_paper/10/svd/*.pkl 2>/dev/null | head -1)
  if [ "$RC" = "0" ] && [ -n "${NEW:-}" ]; then
    mkdir -p artifacts/blobs10_trajectory
    cp "$NEW" "$ART"
    git add "$ART" && git commit -m "blobs-10: 50-point estimate at step ${FINAL}" -- "$ART" \
      >> "$LOG" 2>&1 || true
    echo "$(date -u) chip_plan: archived $NEW -> $ART" >> "$LOG"
  else
    echo "$(date -u) chip_plan: estimate FAILED (rc=$RC) — continuing; rerun manually" >> "$LOG"
  fi
fi

# ---- phase 2.5: flash-attention decision benchmark on the idle chip --------
if [ -f /tmp/flash_check.done ]; then
  echo "$(date -u) chip_plan: flash check already done -> skip" >> "$LOG"
else
  timeout 1800 python -u scripts/check_flash_attn.py \
    > /tmp/flash_check.log 2>&1
  RC=$?
  echo "$(date -u) chip_plan: flash check rc=$RC" >> "$LOG"
  [ "$RC" = "0" ] && touch /tmp/flash_check.done
fi

# ---- phase 3: restart squares-10 under watchdog (skip if already running) --
if alive /tmp/squares10.pid || alive /tmp/squares10_watchdog.pid; then
  echo "$(date -u) chip_plan: squares already supervised -> skip launch" >> "$LOG"
else
  nohup python -u main.py --config cluster/runs/squares10_resume.py \
    --mode train --workdir logs/squares_paper/10 --resume \
    > /tmp/squares10_resume_r4.log 2>&1 &
  echo $! > /tmp/squares10.pid
  STALL_S=1800 nohup bash cluster/watchdog.sh /tmp/squares10.pid \
    logs/squares_paper/10/metrics.jsonl cluster/runs/squares10_resume.py \
    logs/squares_paper/10 /tmp/squares10 > /tmp/squares10_watchdog.out 2>&1 &
  echo $! > /tmp/squares10_watchdog.pid
  echo "$(date -u) chip_plan: squares restarted (trainer $(cat /tmp/squares10.pid))" >> "$LOG"
fi
