#!/bin/bash
# Round-5: beat-the-reference quality arm (VERDICT r4 #8).
#
# PERF.md's conv microbench shows the reference-parity C=64 flagship is
# lane-capped (MXU lanes are 128-wide; the 64-channel levels run the array
# half-empty), and the throughput half is already measured: the 128-wide
# flagship trains at 86.0 vs 172.3 img/s — 4x the FLOPs/capacity at 2x the
# per-image cost. This script lands the TRAINED-QUALITY half: one adaptive
# scale-0.5 run at --base_channels 128 on the SAME corpus/seeds/protocol as
# the round-4 sweep's C=64 arm (exp_adaptive_depth_scale0.50_depth3), so
# val/eval PSNR is directly comparable as a "TPU-first redesign" datapoint
# the reference (fixed 64-wide, train_adaptive_unet.py:249) could not reach.
#
# Usage: bash scripts/r5_c128_quality.sh    (chip; ~45 min — the every-epoch
#        34M-param checkpoint pull costs ~14 s/epoch through the tunnel; add
#        --ckpt_every 10 to the extra_args if re-running where that matters)
# Collect: mkdir -p /tmp/r5c128_wrap && ln -sfn /tmp/r5c128 /tmp/r5c128_wrap/adaptive_depth
#          BASE=/tmp/r5c128_wrap DST=experiments/round5_c128 EXPERIMENTS=adaptive_depth \
#            CORPUS_MODE=structured DO_EXPORT=0 bash scripts/r4_sweep_collect.sh
set -eo pipefail
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
BASE=${BASE:-/tmp/r5c128}
CORPUS=${CORPUS:-/tmp/r4sweep}   # reuse the round-4 structured corpus
mkdir -p "$BASE/transcripts"
[ -d "$CORPUS/train_hr" ] || python scripts/make_synth_corpus.py --out "$CORPUS/train_hr" --n 48 --size 512 --seed 0
[ -d "$CORPUS/eval_hr" ]  || python scripts/make_synth_corpus.py --out "$CORPUS/eval_hr" --n 12 --size 512 --seed 777

if [ ! -f "$BASE/transcripts/run-simple-scale0.5.done" ]; then
  python -m adunet.cli.run_experiment --experiment adaptive_depth --mode run \
    --scales 0.5 \
    --high_res_dir "$CORPUS/train_hr" --auto_eval --eval_hr_dir "$CORPUS/eval_hr" \
    --model_dir "$BASE/models" --log_dir "$BASE/logs" --metadata_dir "$BASE/metadata" \
    --extra_args --patches_per_image 16 --device_cache --patience 15 --base_channels 128 \
    > "$BASE/transcripts/run-simple-scale0.5.log" 2>&1
  touch "$BASE/transcripts/run-simple-scale0.5.done"
fi
echo "C128 TRAINING DONE"
tail -5 "$BASE/transcripts/run-simple-scale0.5.log"
