#!/bin/bash
# Round-3 follow-up: re-run the protocol-B seed-42 EMA-vs-precise-BN
# diagnosis pair AFTER the snapshot_refresh_batches fix, so the two runs
# genuinely share one weight trajectory (the original pair was produced
# while precise-BN setup consumed one shuffle epoch, shifting data order).
# Verified post-hoc: per-epoch TRAIN metrics must now be identical.
set -e
cd /root/repo
BASE=/tmp/r3seg2
rm -rf $BASE && mkdir -p $BASE
python scripts/make_synth_isic.py --out $BASE/corpus --n-train 200 --n-val 24 --size 256 --seed 0

COMMON="--train_images $BASE/corpus/train_images --train_masks $BASE/corpus/train_masks \
 --val_images $BASE/corpus/val_images --val_masks $BASE/corpus/val_masks \
 --model_dir $BASE/models --log_dir $BASE/logs --mixed_precision --patience 999 --epochs 60"

python -m adunet.cli.train_seg --protocol B --seed 42 $COMMON \
  --run_name diagB42_ema 2>&1 | tail -4
python -m adunet.cli.train_seg --protocol B --seed 42 $COMMON \
  --precise_bn 13 --run_name diagB42_precise 2>&1 | tail -4

python - <<'EOF'
import csv
from pathlib import Path

def rows(name):
    with open(f"/tmp/r3seg2/logs/{name}/epoch_metrics.csv") as f:
        return list(csv.DictReader(f))

ema, pre = rows("diagB42_ema"), rows("diagB42_precise")
assert len(ema) == len(pre) == 60, (len(ema), len(pre))
worst = 0.0
for a, b in zip(ema, pre):
    for k in ("loss", "dice"):
        worst = max(worst, abs(float(a[k]) - float(b[k])))
print(f"max |train metric delta| across 60 epochs: {worst:.3e}")
assert worst < 5e-3, "trajectories differ — fix regressed"
print("val_dice ema final:", ema[-1]["val_dice"], "| precise final:", pre[-1]["val_dice"])
EOF
echo "=== DONE ==="
