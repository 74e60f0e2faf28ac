#!/usr/bin/env bash
# Archive the newest orbax checkpoint of a run into artifacts/ (tracked by
# git) so a VM re-provision cannot lose trained state again: round 4 lost
# the squares-10 328k and blobs-10 15.6k checkpoints because logs/ is
# gitignored and the host was rebuilt mid-round.
#
# Usage: cluster/archive_checkpoint.sh <workdir> <name>
#   e.g. cluster/archive_checkpoint.sh logs/blobs_paper/10 blobs10
# Produces artifacts/checkpoints/<name>_step<K>.tar.gz containing the
# newest checkpoint dir + config.pkl + metrics.jsonl, then commits it.
# Overwrites (replaces) any older archive of the same run to bound repo
# growth; on-disk history of spectra stays in artifacts/<name>_trajectory.
set -eu
cd "$(dirname "$0")/.."
WD=$1
NAME=$2
# CheckpointKeeper layout: $WD/last/<step> (most recent), $WD/best/<step>
CKROOT="$WD/last"
[ -d "$CKROOT" ] || { echo "no last/ checkpoints under $WD" >&2; exit 1; }
# newest COMMITTED step dir (orbax: <step> numeric dirs; skip in-flight
# .orbax-checkpoint-tmp dirs so we never archive a half-written step)
STEP=$(ls "$CKROOT" | grep -E '^[0-9]+$' | sort -n | tail -1)
[ -n "$STEP" ] || { echo "no step dirs in $CKROOT" >&2; exit 1; }
mkdir -p artifacts/checkpoints
OUT="artifacts/checkpoints/${NAME}_step${STEP}.tar.gz"
TMP="${OUT}.tmp"
tar czf "$TMP" -C "$WD" "last/$STEP" \
  $( [ -f "$WD/config.pkl" ] && echo config.pkl ) \
  $( [ -f "$WD/metrics.jsonl" ] && echo metrics.jsonl )
mv "$TMP" "$OUT"
# drop older archives of the same run (keep only the newest step)
for f in artifacts/checkpoints/${NAME}_step*.tar.gz; do
  [ "$f" = "$OUT" ] || git rm -q --cached "$f" 2>/dev/null || true
  [ "$f" = "$OUT" ] || rm -f "$f"
done
SZ=$(du -h "$OUT" | cut -f1)
git add -f "$OUT"
# pathspec commit: safe to run from a background loop — never sweeps up
# unrelated files another process has staged.  If HEAD is already an
# archive commit for this run, AMEND it instead: consecutive archives then
# collapse to ONE history entry, the replaced ~1GB tarball blob becomes
# unreachable, and the gc below reclaims it — bounding .git growth to one
# checkpoint per run instead of one per interval.
MSG="artifacts: archive $NAME checkpoint at step $STEP ($SZ)

No-Verification-Needed: binary checkpoint artifact only"
if git log -1 --format=%s | grep -q "^artifacts: archive $NAME checkpoint"; then
  git commit -q --amend -m "$MSG" -- artifacts/checkpoints/ || true
  # reclaim the amended-away tarball blob (loose + unreachable) WITHOUT a
  # full repack — git gc would re-pack the live ~1GB blob every interval
  # on this single-core host
  git reflog expire --expire-unreachable=now --all 2>/dev/null || true
  git prune --expire=now 2>/dev/null || true
else
  git commit -q -m "$MSG" -- artifacts/checkpoints/ || true
fi
echo "archived $OUT ($SZ)"
