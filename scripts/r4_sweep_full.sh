#!/bin/bash
# Round-4: reference-length E1+E2 sweep on chip (VERDICT r3 item #1).
#
# The round-2 sweep trained 8 epochs, leaving scales <=0.6 at the identity
# start (val PSNR moved +0.008 dB) — its E1~E2 table measured bicubic
# degradation, not learning. This re-runs all 15 runs at the reference's
# budget (100 epochs, early-stop patience 15, per
# run_experiment_adaptive_depth.sh:47-98) over the SAME reproducible corpus
# (seeds 0/777) so the trained table is directly comparable to round 2's.
#
# Resumable: each run drops a .done marker; re-running the script skips
# completed runs. Transcripts are named run-simple-scale*.log so
# adunet.cli.export_log_metrics can mine them (reference log-name parity).
# Env knobs: BASE (work dir), CORPUS_MODE (structured | natural — natural is
# the 1/f-spectrum corpus whose identity-PSNR curve tracks BASELINE.md's
# DIV2K band), EXPERIMENTS ("adaptive_depth fixed_depth" by default).
set -eo pipefail
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
BASE=${BASE:-/tmp/r4sweep}
CORPUS_MODE=${CORPUS_MODE:-structured}
EXPERIMENTS=${EXPERIMENTS:-"adaptive_depth fixed_depth"}
mkdir -p "$BASE"
[ -d "$BASE/train_hr" ] || python scripts/make_synth_corpus.py --mode "$CORPUS_MODE" --out "$BASE/train_hr" --n 48 --size 512 --seed 0
[ -d "$BASE/eval_hr" ]  || python scripts/make_synth_corpus.py --mode "$CORPUS_MODE" --out "$BASE/eval_hr" --n 12 --size 512 --seed 777

# The zero-init residual head (reference identity-start behavior) produces
# a ~500-800 optimizer-step plateau at the reference lr 1e-4 before val
# metrics take off (see experiments/round3_flagship's curve: flat to epoch
# ~25 at 19 steps/epoch, then +8.8 dB by epoch 100). The bs-64 scales get
# only 10 steps/epoch from a 16-patches-per-image pass, so patience 15 =
# 150 steps would stop them INSIDE the plateau (measured: scale 0.2 stopped
# at epoch 40, +0.03 dB). Raise patches_per_image at those scales so every
# run sees >=20 steps/epoch (>=2k steps at 100 epochs) — an epoch is a full
# pass over the sampled patch corpus either way.
ppi_for () {
  case "$1" in
    0.2|0.3) echo 64 ;;
    *)       echo 16 ;;
  esac
}

# Checkpoint flags per model size: the 34M/138M configs (depth>=4) pay a
# multi-minute device->host state pull per checkpoint through this
# environment's tunnel (~12 MB/s measured: 8s for the 8.6M state), so deep
# runs checkpoint every 10 epochs (final/early-stop epoch always saves) with
# async Orbax writes. Cadence is semantics-neutral for training math, and
# since round 5 it is also quality-neutral on disk: fit() backfills a
# checkpoint of the restored-best state whenever the cadence skipped the
# best epoch (adunet/train/loop.py), so --auto_eval's restore_best always
# evaluates the run's true best regardless of --ckpt_every.
ckpt_flags_for () {
  local exp=$1 scale=$2
  if [ "$exp" = adaptive_depth ]; then
    case "$scale" in
      0.6|0.7|0.8) echo "--ckpt_every 10 --async_checkpoint" ;;
      *) echo "" ;;
    esac
  else
    echo ""
  fi
}

run_one () {
  local exp=$1 scale=$2
  local tdir=$BASE/$exp
  mkdir -p "$tdir/transcripts"
  if [ -f "$tdir/transcripts/run-simple-scale${scale}.done" ]; then
    echo "skip $exp scale $scale (done)"; return 0
  fi
  echo "=== $exp scale $scale start $(date -u +%H:%M:%S) ==="
  python -m adunet.cli.run_experiment --experiment "$exp" --mode run \
    --scales "$scale" \
    --high_res_dir "$BASE/train_hr" --auto_eval --eval_hr_dir "$BASE/eval_hr" \
    --model_dir "$tdir/models" --log_dir "$tdir/logs" --metadata_dir "$tdir/metadata" \
    --extra_args --patches_per_image "$(ppi_for "$scale")" --device_cache --patience 15 $(ckpt_flags_for "$exp" "$scale") \
    > "$tdir/transcripts/run-simple-scale${scale}.log" 2>&1
  touch "$tdir/transcripts/run-simple-scale${scale}.done"
  echo "=== $exp scale $scale done  $(date -u +%H:%M:%S) ==="
}

# adaptive (E2) first: it holds the slow depth-5 runs; fail fast on config.
for exp in $EXPERIMENTS; do
  if [ "$exp" = fixed_depth ]; then scales="0.2 0.3 0.4 0.5 0.6 0.7 0.8 0.9"; else scales="0.2 0.3 0.4 0.5 0.6 0.7 0.8"; fi
  for s in $scales; do run_one "$exp" "$s"; done
done
echo "SWEEP TRAINING DONE"

# Analysis chain per experiment: transcripts -> CSV, trend analysis, plots.
for exp in $EXPERIMENTS; do
  tdir=$BASE/$exp
  python -m adunet.cli.export_log_metrics \
    --logs-root "$tdir/transcripts" --output-root "$tdir/csv_logs_from_transcripts" \
    > "$tdir/transcripts/export.log" 2>&1 || echo "export_log_metrics failed for $exp"
  python -m adunet.cli.analyse_experiment_metrics \
    --csv-root "$tdir/logs" --output-dir "$tdir/analysis" \
    > "$tdir/transcripts/analyse.log" 2>&1 || echo "analyse failed for $exp"
  python -m adunet.cli.plot_experiment_metrics \
    --experiment-dir "$tdir/logs" --output-dir "$tdir/plots" \
    > "$tdir/transcripts/plot.log" 2>&1 || echo "plot failed for $exp"
done
echo "SWEEP ALL DONE"
