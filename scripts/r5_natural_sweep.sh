#!/bin/bash
# Round-5: E2 (adaptive-depth) sweep on the NATURAL-statistics corpus
# (VERDICT r4 #5). Same trainer/eval flags as scripts/r4_sweep_full.sh, but
# over the 1/f-spectrum corpus whose identity-PSNR curve tracks BASELINE.md's
# DIV2K band — so the trained PSNR-vs-scale curve is shape-comparable to the
# reference's 32->41 dB rising band
# (experiment_1_constant_depth_3/plots/summary_metrics.csv:1-9).
#
# Env knobs: BASE (work dir), SCALES (defaults to the BASELINE.md band's
# sample points that exist in the E2 table), EXPERIMENT (adaptive_depth).
# Resumable via per-run .done markers, like the r4 driver.
set -eo pipefail
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
BASE=${BASE:-/tmp/r5nat}
EXPERIMENT=${EXPERIMENT:-adaptive_depth}
SCALES=${SCALES:-"0.2 0.3 0.5 0.7 0.8"}
mkdir -p "$BASE"
[ -d "$BASE/train_hr" ] || python scripts/make_synth_corpus.py --mode natural --out "$BASE/train_hr" --n 48 --size 512 --seed 0
[ -d "$BASE/eval_hr" ]  || python scripts/make_synth_corpus.py --mode natural --out "$BASE/eval_hr" --n 12 --size 512 --seed 777

# same plateau-aware patches_per_image policy as r4_sweep_full.sh
ppi_for () {
  case "$1" in
    0.2|0.3) echo 64 ;;
    *)       echo 16 ;;
  esac
}
ckpt_flags_for () {
  case "$1" in
    0.6|0.7|0.8) echo "--ckpt_every 10 --async_checkpoint" ;;
    *) echo "" ;;
  esac
}

tdir=$BASE/$EXPERIMENT
mkdir -p "$tdir/transcripts"
for s in $SCALES; do
  if [ -f "$tdir/transcripts/run-simple-scale${s}.done" ]; then
    echo "skip $EXPERIMENT scale $s (done)"; continue
  fi
  echo "=== natural $EXPERIMENT scale $s start $(date -u +%H:%M:%S) ==="
  python -m adunet.cli.run_experiment --experiment "$EXPERIMENT" --mode run \
    --scales "$s" \
    --high_res_dir "$BASE/train_hr" --auto_eval --eval_hr_dir "$BASE/eval_hr" \
    --model_dir "$tdir/models" --log_dir "$tdir/logs" --metadata_dir "$tdir/metadata" \
    --extra_args --patches_per_image "$(ppi_for "$s")" --device_cache --patience 15 $(ckpt_flags_for "$s") \
    > "$tdir/transcripts/run-simple-scale${s}.log" 2>&1
  touch "$tdir/transcripts/run-simple-scale${s}.done"
  echo "=== natural $EXPERIMENT scale $s done  $(date -u +%H:%M:%S) ==="
done
echo "NATURAL SWEEP TRAINING DONE"

python -m adunet.cli.plot_experiment_metrics \
  --experiment-dir "$tdir/logs" --output-dir "$tdir/plots" \
  > "$tdir/transcripts/plot.log" 2>&1 || echo "plot failed"
echo "NATURAL SWEEP ALL DONE"
