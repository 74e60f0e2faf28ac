#!/usr/bin/env bash
# Restore an archived checkpoint (cluster/archive_checkpoint.sh) into a
# fresh workdir so a later round can resume training / run estimates after
# a VM re-provision wiped the gitignored logs/ tree.
#
# Usage: cluster/restore_checkpoint.sh <archive.tar.gz> <workdir>
#   e.g. cluster/restore_checkpoint.sh \
#          artifacts/checkpoints/blobs10_step120000.tar.gz logs/blobs_paper/10
set -eu
cd "$(dirname "$0")/.."
AR=$1
WD=$2
[ -f "$AR" ] || { echo "no archive $AR" >&2; exit 1; }
mkdir -p "$WD"
tar xzf "$AR" -C "$WD"
echo "restored into $WD:"
ls "$WD" "$WD/last"
