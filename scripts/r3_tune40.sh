#!/bin/bash
# Round-3: 40-trial on-chip TPE study (VERDICT r2 #8 — reference-scale
# evidence that the sampler converges and the median pruner saves wall-clock;
# the reference's optuna studies default to 50 trials,
# u_net_vanilla_optuna.py:153-283).
set -e
cd /root/repo
BASE=/tmp/r3tune
rm -rf $BASE && mkdir -p $BASE
python scripts/make_synth_corpus.py --out $BASE/train_hr --n 48 --size 512 --seed 0

T0=$(date +%s)
python -m adunet.cli.tune --workload sr --n-trials 40 --epochs 4 \
  --high-res-dir $BASE/train_hr --retrain --final-epochs 8 \
  --model-dir $BASE/models \
  --results $BASE/tune_sr_results.json 2>&1 | tail -20
T1=$(date +%s)
echo "study wall-clock: $((T1-T0)) s"

DST=/root/repo/experiments/round3_sweep/tune_sr
rm -rf $DST && mkdir -p $DST
cp $BASE/tune_sr_results.json $DST/
python - "$((T1-T0))" <<'EOF'
import json, sys
from pathlib import Path
wall = int(sys.argv[1])
res = json.loads(Path("/root/repo/experiments/round3_sweep/tune_sr/tune_sr_results.json").read_text())
trials = res["trials"]
budget = res["n_trials"] * 4  # epochs if nothing pruned
spent = sum(len(t.get("intermediate", {})) or 4 for t in trials)
stats = {
    "n_trials": res["n_trials"],
    "n_complete": res["n_complete"],
    "n_pruned": res["n_pruned"],
    "best_value": res["best_value"],
    "best_params": res["best_params"],
    "trial0_value": trials[0]["value"],
    "improvement_over_trial0": (trials[0]["value"] or 1) / res["best_value"],
    "epoch_budget_no_pruning": budget,
    "epochs_executed": spent,
    "epochs_saved_by_pruning": budget - spent,
    "pruning_saving_fraction": round(1 - spent / budget, 3),
    "study_wall_clock_sec": wall,
}
Path("/root/repo/experiments/round3_sweep/tune_sr/STUDY_STATS.json").write_text(
    json.dumps(stats, indent=2) + "\n")
print(json.dumps(stats, indent=2))
EOF
echo "=== DONE ==="
