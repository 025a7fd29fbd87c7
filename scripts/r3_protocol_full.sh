#!/bin/bash
# Round-3 fifth session: REFERENCE-LENGTH protocol runs on chip.
#
# The round-3 seg sweep (r3_seg_rerun.sh) ran 60 epochs with early stop
# disabled to compare protocols on equal footing. This script runs each
# protocol at its published full length with its published stopping rule
# (Segmenation/code/train_adaptive_unet.py:370-403):
#   A: 100 epochs, cosine 1e-3 -> 0, bs 8,  EarlyStopping(val_dice, patience 15)
#   B: 200 epochs, fixed 3e-4,      bs 16, no early stop
# precise_bn keeps eval-mode BatchNorm statistics honest on the small
# synthetic corpus (round-3 diagnosis); cache_decoded removes the host
# decode bound on 1-core session hosts.
set -e
cd /root/repo
BASE=/tmp/r3segfull
rm -rf $BASE && mkdir -p $BASE
python scripts/make_synth_isic.py --out $BASE/corpus --n-train 200 --n-val 24 --size 256 --seed 0

COMMON="--train_images $BASE/corpus/train_images --train_masks $BASE/corpus/train_masks \
 --val_images $BASE/corpus/val_images --val_masks $BASE/corpus/val_masks \
 --model_dir $BASE/models --log_dir $BASE/logs --mixed_precision \
 --precise_bn 13 --cache_decoded"

echo "=== Protocol A, full length (100 ep, ES patience 15) ==="
python -m adunet.cli.train_seg --protocol A --seed 42 $COMMON \
  --run_name full_protocolA_seed42 2>&1 | tail -8

echo "=== Protocol B, full length (200 ep, no ES) ==="
python -m adunet.cli.train_seg --protocol B --seed 42 $COMMON \
  --run_name full_protocolB_seed42 2>&1 | tail -8

echo "=== collect ==="
DST=/root/repo/experiments/round3_sweep/seg_protocols_full
rm -rf $DST && mkdir -p $DST/csv_logs $DST/run_configs
for run in full_protocolA_seed42 full_protocolB_seed42; do
  mkdir -p $DST/csv_logs/$run
  cp $BASE/logs/$run/epoch_metrics.csv $DST/csv_logs/$run/
  cp $BASE/logs/$run/config.json $DST/run_configs/$run.json 2>/dev/null || \
    cp $BASE/models/$run/config.json $DST/run_configs/$run.json 2>/dev/null || true
done
echo "collected into $DST"
find $DST -type f
echo "=== DONE ==="
