#!/bin/bash
# Collect the round-3 seg protocol artifacts into the repo experiment tree.
set -e
DST=/root/repo/experiments/round3_sweep/seg_protocols
BASE=/tmp/r3seg
rm -rf $DST && mkdir -p $DST/csv_logs $DST/run_configs $DST/model_summary $DST/diagnosis
for run in exp_seg_protocolA_seed42 exp_seg_protocolA_seed43 \
           exp_seg_protocolB_seed42 exp_seg_protocolB_seed43; do
  mkdir -p $DST/csv_logs/$run
  cp $BASE/logs/$run/epoch_metrics.csv $DST/csv_logs/$run/
  cp $BASE/logs/$run/config.json $DST/run_configs/$run.json 2>/dev/null || \
    cp $BASE/models/$run/config.json $DST/run_configs/$run.json 2>/dev/null || true
  cp $BASE/logs/$run/model_summary.txt $DST/model_summary/$run.txt 2>/dev/null || true
done
for run in diagB42_ema diagB42_precise; do
  mkdir -p $DST/diagnosis/$run
  cp $BASE/logs/$run/epoch_metrics.csv $DST/diagnosis/$run/
done
echo "collected into $DST"
find $DST -type f | wc -l
