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
# corpus provenance pinned into GOLDEN.json so the re-derivation goldens
# regenerate the RIGHT corpus (ADVICE r4: a natural-mode sweep must not be
# silently compared against a regenerated structured corpus)
CORPUS_MODE=${CORPUS_MODE:-structured}

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

# int8 AOT export of the trained depth-1 run: small enough to check in
# (~0.6 MB) and it pins the TRAINED pipeline at a depth/shave the flagship
# golden (d3, shave 4) does not cover — tests/test_golden_eval.py re-derives
# its eval on CPU from first principles. DO_EXPORT=0 skips (e.g. the
# round-5 natural-corpus collect, which only needs the quality table and
# must not claim the chip while another run holds it).
DO_EXPORT=${DO_EXPORT:-1}
if [ "$DO_EXPORT" = 1 ] && [ -d "$BASE/adaptive_depth/models/unet_adaptive_scale0.20_depth1" ]; then
  PYTHONPATH=/root/repo:/root/.axon_site python -m adunet.cli.export_model \
    --model-path "$BASE/adaptive_depth/models/unet_adaptive_scale0.20_depth1" \
    --scale 0.2 --patch-size 256 --batch-size 8 --quantize int8 \
    --output-dir "$DST/export_scale0.2_int8" && echo "exported d1 int8"
fi

# GOLDEN.json: the pinned trained table (eval metrics + the identity-anchor
# vs final val PSNR per run) — regression-locked by tests/test_golden_eval.py.
python - <<EOF
import csv, json
from pathlib import Path

dst = Path("$DST")
golden = {}
for exp in "$EXPERIMENTS".split():
    table = {}
    exp_dir = dst / exp
    for eval_dir in sorted((exp_dir / "evaluation").glob("exp_*_eval")):
        run = eval_dir.name[: -len("_eval")]
        metrics = json.loads((eval_dir / "metrics.json").read_text())
        rows = list(csv.DictReader((exp_dir / "csv_logs" / run / "epoch_metrics.csv").open()))
        table[run] = {
            "psnr_mean": metrics["psnr_mean"],
            "ssim_mean": metrics["ssim_mean"],
            "msssim_mean": metrics["msssim_mean"],
            "samples": metrics["samples"],
            "val_psnr_epoch1": float(rows[0]["val_psnr"]),
            "val_psnr_final": float(rows[-1]["val_psnr"]),
            "epochs_ran": len(rows),
        }
    golden[exp] = table
golden["_corpus"] = {
    "mode": "$CORPUS_MODE",
    "train_seed": 0,
    "eval_seed": 777,
    "n_eval": 12,
    "size": 512,
}
(dst / "GOLDEN.json").write_text(json.dumps(golden, indent=2) + "\n")
n_runs = sum(len(v) for k, v in golden.items() if not k.startswith("_"))
print(f"GOLDEN.json: {n_runs} runs pinned (corpus mode: $CORPUS_MODE)")
EOF
