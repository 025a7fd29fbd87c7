#!/bin/bash
# Collect the round-4 reference-length sweep artifacts into the repo
# (same tree shape as experiments/round2_sweep; checkpoints and TB event
# files stay in the work dir — they are regenerable and large).
#
# Usage: BASE=/tmp/r4sweep DST=experiments/round4_sweep bash scripts/r4_sweep_collect.sh
set -eo pipefail
cd /root/repo
BASE=${BASE:-/tmp/r4sweep}
DST=${DST:-experiments/round4_sweep}
EXPERIMENTS=${EXPERIMENTS:-"adaptive_depth fixed_depth"}

for exp in $EXPERIMENTS; do
  src=$BASE/$exp
  [ -d "$src" ] || { echo "skip $exp (no $src)"; continue; }
  out=$DST/$exp
  mkdir -p "$out"/{csv_logs,run_configs,model_summary}
  for run_dir in "$src"/logs/exp_*; do
    run=$(basename "$run_dir")
    mkdir -p "$out/csv_logs/$run"
    cp "$run_dir/epoch_metrics.csv" "$out/csv_logs/$run/"
    cp "$run_dir/config.json" "$out/run_configs/$run.json"
    cp "$run_dir/model_summary.txt" "$out/model_summary/$run.txt"
  done
  for sub in evaluation analysis plots metadata csv_logs_from_transcripts; do
    if [ -d "$src/logs/$sub" ]; then cp -r "$src/logs/$sub" "$out/"; fi
    if [ -d "$src/$sub" ]; then cp -r "$src/$sub" "$out/"; fi
  done
  # per-run driver transcripts (mined by export_log_metrics)
  mkdir -p "$out/transcripts"
  cp "$src"/transcripts/*.log "$out/transcripts/" 2>/dev/null || true
  echo "collected $exp -> $out"
done
