#!/bin/bash
# Round-3: protocol-B seed-42 diagnosis + healthy seg protocol sweep re-run.
set -e
cd /root/repo
BASE=/tmp/r3seg
rm -rf $BASE && mkdir -p $BASE
python scripts/make_synth_isic.py --out $BASE/corpus --n-train 200 --n-val 24 --size 256 --seed 0

COMMON="--train_images $BASE/corpus/train_images --train_masks $BASE/corpus/train_masks \
 --val_images $BASE/corpus/val_images --val_masks $BASE/corpus/val_masks \
 --model_dir $BASE/models --log_dir $BASE/logs --mixed_precision --patience 999 --epochs 60"

echo "=== DIAGNOSIS: protocol B seed 42, EMA stats (expect eval-mode collapse) ==="
python -m adunet.cli.train_seg --protocol B --seed 42 $COMMON \
  --run_name diagB42_ema 2>&1 | tail -30

echo "=== DIAGNOSIS: protocol B seed 42, precise-BN (same weights trajectory) ==="
python -m adunet.cli.train_seg --protocol B --seed 42 $COMMON \
  --precise_bn 13 --run_name diagB42_precise 2>&1 | tail -30

echo "=== SWEEP: 4 healthy runs (A/B x 42/43, precise_bn 13) ==="
for P in A B; do for S in 42 43; do
python -m adunet.cli.train_seg --protocol $P --seed $S $COMMON \
  --precise_bn 13 --run_name exp_seg_protocol${P}_seed${S} 2>&1 | tail -6
done; done
echo "=== DONE ==="
