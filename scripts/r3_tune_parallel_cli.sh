#!/bin/bash
# Round-3: the PRODUCTION tuner CLI end-to-end on chip with --parallel-trials.
# The existing chip evidence for trial batching (tune_parallel_bench.jsonl)
# drives BatchedVanillaSRTuner directly; this runs the real user surface —
# adunet.cli.tune with TPE constant-liar batched asks, batch-size grouping,
# fixed lane-width padding, and the final results payload — in both modes on
# the same corpus/seed/trial budget, and records both wall-clocks.
#
# Both arms run with --pruner none so speedup_wall measures parallelism
# alone: the sequential arm would otherwise take the optuna median-pruning
# path while the batched engine never prunes intra-trial (ADVICE r3).
#
# Usage: bash scripts/r3_tune_parallel_cli.sh   (chip; ~15-30 min cold)
set -eo pipefail
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
BASE=/tmp/r3tunepar
rm -rf $BASE && mkdir -p $BASE
python scripts/make_synth_corpus.py --out $BASE/train_hr --n 48 --size 256 --seed 0

run_mode () {  # $1 = label, $2 = parallel flag value
  T0=$(date +%s)
  python -m adunet.cli.tune --workload sr --n-trials 16 --epochs 4 \
    --image-size 128 --parallel-trials "$2" --pruner none \
    --high-res-dir $BASE/train_hr \
    --results $BASE/results_$1.json > $BASE/tune_$1.log 2>&1
  tail -4 $BASE/tune_$1.log
  T1=$(date +%s)
  echo "$1 wall-clock: $((T1-T0)) s"
  echo $((T1-T0)) > $BASE/wall_$1
}

run_mode parallel8 8
run_mode sequential 1

# Stage into a temp dir and swap in atomically so a failed run can't
# destroy previously recorded chip evidence (ADVICE r3).
DST=/root/repo/experiments/round3_sweep/tune_sr_parallel_cli
STAGE=$(mktemp -d "$DST.stage.XXXX")
cp $BASE/results_parallel8.json $BASE/results_sequential.json "$STAGE"/
STAGE=$STAGE python - <<'EOF'
import json
import os
from pathlib import Path

base = Path("/tmp/r3tunepar")
stage = Path(os.environ["STAGE"])
par = json.loads((base / "results_parallel8.json").read_text())
seq = json.loads((base / "results_sequential.json").read_text())
wp = int((base / "wall_parallel8").read_text())
ws = int((base / "wall_sequential").read_text())
stats = {
    "protocol": "adunet.cli.tune --workload sr, 16 trials x 4 epochs, 128px, "
                "48-image synthetic corpus, seed 42; parallel-trials 8 vs 1; "
                "BOTH arms --pruner none (sequential arm otherwise median-prunes "
                "via optuna while the batched engine never prunes intra-trial)",
    "parallel8": {"wall_s": wp, "best_value": par["best_value"],
                  "best_params": par["best_params"],
                  "engine": "built-in batched TPE (constant-liar asks)",
                  "n_complete": par.get("n_complete"),
                  "n_pruned": par.get("n_pruned")},
    "sequential": {"wall_s": ws, "best_value": seq["best_value"],
                   "best_params": seq["best_params"],
                   "engine": "sequential TPE, pruner disabled",
                   "n_complete": seq.get("n_complete"),
                   "n_pruned": seq.get("n_pruned")},
    "speedup_wall": round(ws / wp, 2),
}
(stage / "STUDY_STATS.json").write_text(json.dumps(stats, indent=2) + "\n")
print(json.dumps(stats, indent=2))
EOF
rm -rf "$DST"
mv "$STAGE" "$DST"
echo "=== DONE ==="
