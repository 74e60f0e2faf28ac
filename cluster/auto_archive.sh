#!/usr/bin/env bash
# Periodically archive a run's newest checkpoint into git (see
# archive_checkpoint.sh) so a host rebuild costs at most INTERVAL_S of
# training.  Runs until the stop file appears.
#
# Usage: cluster/auto_archive.sh <workdir> <name> [interval_s]
#   e.g. nohup cluster/auto_archive.sh logs/blobs_paper/10 blobs10 1800 &
set -u
cd "$(dirname "$0")/.."
WD=$1
NAME=$2
INTERVAL_S=${3:-1800}
STOP_FILE=${STOP_FILE:-/tmp/iddiff_auto_archive.stop}
while true; do
  sleep "$INTERVAL_S"
  [ -f "$STOP_FILE" ] && exit 0
  bash cluster/archive_checkpoint.sh "$WD" "$NAME" \
    >> /tmp/auto_archive_${NAME}.log 2>&1 || true
done
