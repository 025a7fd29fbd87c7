#!/bin/bash
# Round-3: the PRODUCTION tuner CLI end-to-end on chip with --parallel-trials.
# The existing chip evidence for trial batching (tune_parallel_bench.jsonl)
# drives BatchedVanillaSRTuner directly; this runs the real user surface —
# adunet.cli.tune with TPE constant-liar batched asks, batch-size grouping,
# fixed lane-width padding, and the final results payload — in both modes on
# the same corpus/seed/trial budget, and records both wall-clocks.
#
# Usage: bash scripts/r3_tune_parallel_cli.sh   (chip; ~15-30 min cold)
set -e
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
BASE=/tmp/r3tunepar
rm -rf $BASE && mkdir -p $BASE
python scripts/make_synth_corpus.py --out $BASE/train_hr --n 48 --size 256 --seed 0

run_mode () {  # $1 = label, $2 = parallel flag value
  T0=$(date +%s)
  python -m adunet.cli.tune --workload sr --n-trials 16 --epochs 4 \
    --image-size 128 --parallel-trials "$2" \
    --high-res-dir $BASE/train_hr \
    --results $BASE/results_$1.json 2>&1 | tail -4
  T1=$(date +%s)
  echo "$1 wall-clock: $((T1-T0)) s"
  echo $((T1-T0)) > $BASE/wall_$1
}

run_mode parallel8 8
run_mode sequential 1

DST=/root/repo/experiments/round3_sweep/tune_sr_parallel_cli
rm -rf $DST && mkdir -p $DST
cp $BASE/results_parallel8.json $BASE/results_sequential.json $DST/
python - <<'EOF'
import json
from pathlib import Path

base = Path("/tmp/r3tunepar")
dst = Path("/root/repo/experiments/round3_sweep/tune_sr_parallel_cli")
par = json.loads((base / "results_parallel8.json").read_text())
seq = json.loads((base / "results_sequential.json").read_text())
wp = int((base / "wall_parallel8").read_text())
ws = int((base / "wall_sequential").read_text())
stats = {
    "protocol": "adunet.cli.tune --workload sr, 16 trials x 4 epochs, 128px, "
                "48-image synthetic corpus, seed 42; parallel-trials 8 vs 1",
    "parallel8": {"wall_s": wp, "best_value": par["best_value"],
                  "best_params": par["best_params"],
                  "n_complete": par.get("n_complete"),
                  "n_pruned": par.get("n_pruned")},
    "sequential": {"wall_s": ws, "best_value": seq["best_value"],
                   "best_params": seq["best_params"],
                   "n_complete": seq.get("n_complete"),
                   "n_pruned": seq.get("n_pruned")},
    "speedup_wall": round(ws / wp, 2),
}
(dst / "STUDY_STATS.json").write_text(json.dumps(stats, indent=2) + "\n")
print(json.dumps(stats, indent=2))
EOF
echo "=== DONE ==="
