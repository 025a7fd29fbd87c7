#!/bin/bash
# Retrieve run artifacts (checkpoints, logs, eval reports) from a scratch
# area back into the repo/archive — rebuild of the reference's
# sync_experiment1_models.sh / copy_exp1_*.sbatch retrieval scripts.
#
# Usage: scripts/sync_models.sh SCRATCH_RUNS_DIR ARCHIVE_DIR
set -euo pipefail
SRC=${1:?usage: sync_models.sh SCRATCH_RUNS_DIR ARCHIVE_DIR}
DEST=${2:?usage: sync_models.sh SCRATCH_RUNS_DIR ARCHIVE_DIR}
mkdir -p "$DEST"
if command -v rsync >/dev/null 2>&1; then
  rsync -a --info=progress2 \
    --include '*/' --include '*.json' --include '*.csv' --include '*.txt' \
    --include 'checkpoint*/**' --include '*.orbax-checkpoint*' --include '*.png' \
    "$SRC/" "$DEST/"
else
  cp -ru "$SRC/." "$DEST/"
fi
echo "synced artifacts to $DEST"
