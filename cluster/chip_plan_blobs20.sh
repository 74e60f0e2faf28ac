#!/usr/bin/env bash
# Round-5 phase 2: blobs-20 paper run — the second image ID value
# (VERDICT r4 item 2).  Same supervision pattern as chip_plan_r5.sh
# (trainer + watchdog + archiver, milestone estimates), for the blobs-20
# 120k run; when the budget completes it hands the chip back to the
# squares-10 plan (chip_plan_r5.sh).
#
# Expected read-outs if the estimator tracks ID (truth = 20,
# SyntheticDataset.py:170-183): reference rule 21 (truth+1 — the
# DC-straggler, RESULTS.md round 5), log_gap rule 20.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/chip_plan_blobs20.log
WD=logs/blobs_paper/20
METRICS=$WD/metrics.jsonl
ART_DIR=artifacts/blobs20_trajectory
EST_EVERY=${EST_EVERY:-60000}
TARGET=${TARGET:-119999}
echo "$(date -u) chip_plan_blobs20 start" >> "$LOG"
rm -f "${STOP_FILE:-/tmp/iddiff_watchdog.stop}" /tmp/iddiff_auto_archive.stop

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
  for _ in $(seq 1 20); do
    kill -0 "$P" 2>/dev/null || return 0
    sleep 2
  done
  kill -9 "$P" 2>/dev/null
  sleep 2
  return 0
}

newest_ckpt() {
  ls "$WD/last" 2>/dev/null | grep -E '^[0-9]+$' | sort -n | tail -1
}

launch_trainer() {
  nohup python -u main.py --config cluster/runs/blobs20_run.py \
    --mode train --workdir "$WD" --resume \
    > /tmp/blobs20_train.log 2>&1 &
  echo $! > /tmp/blobs20.pid
  echo "$(date -u) chip_plan_blobs20: trainer launched $(cat /tmp/blobs20.pid)" >> "$LOG"
}

ensure_supervised() {
  if [ ! -d "$WD/last" ]; then
    AR=$(ls -t artifacts/checkpoints/blobs20_step*.tar.gz 2>/dev/null | head -1)
    if [ -n "${AR:-}" ]; then
      bash cluster/restore_checkpoint.sh "$AR" "$WD" >> "$LOG" 2>&1
      echo "$(date -u) chip_plan_blobs20: restored $AR" >> "$LOG"
    fi
  fi
  alive /tmp/blobs20.pid || launch_trainer
  if ! alive /tmp/blobs20_watchdog.pid; then
    STALL_S=1800 MIN_RATE=2 nohup bash cluster/watchdog.sh /tmp/blobs20.pid \
      "$METRICS" cluster/runs/blobs20_run.py "$WD" \
      /tmp/blobs20 > /tmp/blobs20_watchdog.out 2>&1 &
    echo $! > /tmp/blobs20_watchdog.pid
  fi
  if ! alive /tmp/auto_archive_blobs20.pid; then
    nohup bash cluster/auto_archive.sh "$WD" blobs20 1500 \
      > /tmp/auto_archive_b20.out 2>&1 &
    echo $! > /tmp/auto_archive_blobs20.pid
  fi
}

next_milestone() {
  local done
  done=$(ls "$ART_DIR"/estimate50_steps_*.pkl 2>/dev/null \
    | sed -n 's/.*steps_\([0-9]*\)\.pkl/\1/p' | sort -n | tail -1)
  done=${done:-0}
  echo $(( (done / EST_EVERY + 1) * EST_EVERY ))
}

run_estimate() {  # $1 = checkpoint step the estimate is keyed to
  local S=$1 ART NEW RC S2
  ART="$ART_DIR/estimate50_steps_${S}.pkl"
  [ -f "$ART" ] && return 0
  kill_wait /tmp/blobs20_watchdog.pid
  kill_wait /tmp/blobs20.pid
  S2=$(newest_ckpt); S2=${S2:-$S}
  if [ "$S2" != "$S" ]; then
    echo "$(date -u) chip_plan_blobs20: re-keying estimate $S -> $S2" >> "$LOG"
    S=$S2
    ART="$ART_DIR/estimate50_steps_${S}.pkl"
    [ -f "$ART" ] && return 0
  fi
  timeout 7200 python -u main.py --config cluster/runs/blobs20_estimate.py \
    --mode manifold_dimension --workdir "$WD" \
    > /tmp/blobs20_estimate_${S}.log 2>&1
  RC=$?
  NEW=$(ls -t "$WD"/svd/*.pkl 2>/dev/null | head -1)
  if [ "$RC" = "0" ] && [ -n "${NEW:-}" ]; then
    mkdir -p "$ART_DIR"
    cp "$NEW" "$ART"
    git add "$ART" && git commit \
      -m "blobs-20: 50-point estimate at step ${S}" -- "$ART" \
      >> "$LOG" 2>&1 || true
    python - "$ART" "$S" <<'PY' >> "$LOG" 2>&1
import pickle, sys
import numpy as np
sys.path.insert(0, ".")
from iddiff.id import dims_from_spectra
with open(sys.argv[1], "rb") as f:
    svd = pickle.load(f)
sv = np.asarray(svd["singular_values"])
dims = dims_from_spectra(sv)
lg = dims_from_spectra(sv, rule="log_gap")
vals, counts = np.unique(np.asarray(dims, int), return_counts=True)
lv, lc = np.unique(np.asarray(lg, int), return_counts=True)
print(f"blobs20 estimate@{sys.argv[2]}: ref median={np.median(dims):.0f} "
      f"dist={dict(zip(vals.tolist(), counts.tolist()))} | "
      f"log_gap median={np.median(lg):.0f} dist={dict(zip(lv.tolist(), lc.tolist()))}")
PY
    echo "$(date -u) chip_plan_blobs20: archived $ART (rc=$RC)" >> "$LOG"
  else
    echo "$(date -u) chip_plan_blobs20: estimate at $S FAILED rc=$RC" >> "$LOG"
  fi
}

MILESTONE=$(next_milestone)
echo "$(date -u) chip_plan_blobs20: first milestone $MILESTONE" >> "$LOG"
FAILS=0
while true; do
  ensure_supervised
  S=$(newest_ckpt); S=${S:-0}
  if [ "$S" -ge "$TARGET" ]; then
    run_estimate "$S"
    echo "$(date -u) chip_plan_blobs20: budget reached at $S — handing chip to squares plan" >> "$LOG"
    kill_wait /tmp/blobs20_watchdog.pid
    kill_wait /tmp/blobs20.pid
    touch /tmp/iddiff_auto_archive.stop  # archiver exits at its next tick
    nohup bash cluster/chip_plan_r5.sh > /tmp/chip_plan_r5.out 2>&1 &
    echo $! > /tmp/chip_plan_r5.pid
    exit 0
  fi
  if [ "$S" -ge "$MILESTONE" ]; then
    run_estimate "$S"
    NEXT=$(next_milestone)
    if [ "$NEXT" -le "$MILESTONE" ]; then
      FAILS=$((FAILS + 1))
      if [ "$FAILS" -ge 2 ]; then
        echo "$(date -u) chip_plan_blobs20: milestone $MILESTONE failed $FAILS times — skipping" >> "$LOG"
        MILESTONE=$(( MILESTONE + EST_EVERY ))
        FAILS=0
      fi
    else
      MILESTONE=$NEXT
      FAILS=0
    fi
    echo "$(date -u) chip_plan_blobs20: next milestone $MILESTONE" >> "$LOG"
  fi
  sleep 600
done
