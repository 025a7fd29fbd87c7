#!/bin/bash
# Stage a dataset onto node-local scratch before training.
# Rebuild of the reference's rsync staging job
# (/root/reference/Segmenation/scripts/stage_isic_dataset.sbatch): copy the
# dataset to fast local storage, preserving structure, idempotently.
#
# Usage: scripts/stage_dataset.sh SRC_DIR DEST_DIR
set -euo pipefail
SRC=${1:?usage: stage_dataset.sh SRC_DIR DEST_DIR}
DEST=${2:?usage: stage_dataset.sh SRC_DIR DEST_DIR}
mkdir -p "$DEST"
if command -v rsync >/dev/null 2>&1; then
  rsync -a --info=progress2 "$SRC/" "$DEST/"
else
  cp -ru "$SRC/." "$DEST/"
fi
echo "staged $(find "$DEST" -type f | wc -l) files to $DEST"
