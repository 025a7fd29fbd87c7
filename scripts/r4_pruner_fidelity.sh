#!/bin/bash
# Round-4: pruner-fidelity evidence (VERDICT r3 #4 next-round item).
#
# Does the median pruner discard the true winner? Two arms of the SAME study
# — identical seed, RANDOM sampler (positional per-trial RNG, so trial N gets
# identical params whether or not earlier trials were pruned), identical
# trial budget — one with --pruner median, one with --pruner none. The none
# arm's full value vector is ground truth; the collect step reports which
# ground-truth ranks were pruned, whether the true best survived, rank
# agreement on survivors, and the best-value regret.
#
# Usage: bash scripts/r4_pruner_fidelity.sh    (chip; ~20-40 min)
set -eo pipefail
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
BASE=/tmp/r4fidelity
rm -rf $BASE && mkdir -p $BASE
python scripts/make_synth_corpus.py --out $BASE/train_hr --n 48 --size 256 --seed 0

for arm in median none; do
  python -m adunet.cli.tune --workload sr --n-trials 16 --epochs 6 \
    --image-size 128 --sampler random --pruner $arm --seed 42 \
    --high-res-dir $BASE/train_hr \
    --results $BASE/results_$arm.json > $BASE/tune_$arm.log 2>&1
  tail -3 $BASE/tune_$arm.log
done

DST=/root/repo/experiments/round4_sweep/tune_fidelity
STAGE=$(mktemp -d "$DST.stage.XXXX")
cp $BASE/results_median.json $BASE/results_none.json "$STAGE"/
STAGE=$STAGE python - <<'EOF'
import json, os
from pathlib import Path

stage = Path(os.environ["STAGE"])
median = json.loads((stage / "results_median.json").read_text())
none = json.loads((stage / "results_none.json").read_text())

none_by_n = {t["number"]: t for t in none["trials"]}
med_by_n = {t["number"]: t for t in median["trials"]}
common = sorted(set(none_by_n) & set(med_by_n))

# identical param sequences = the isolation premise; hard-fail if violated
mismatched = [n for n in common if none_by_n[n]["params"] != med_by_n[n]["params"]]
assert not mismatched, f"param sequences diverged at trials {mismatched}"

direction = none["direction"]
sign = 1 if direction == "minimize" else -1
truth = sorted(common, key=lambda n: sign * none_by_n[n]["value"])
rank_of = {n: i for i, n in enumerate(truth)}  # 0 = true best

pruned = [n for n in common if med_by_n[n]["state"] == "PRUNED"]
survivors = [n for n in common if med_by_n[n]["state"] == "COMPLETE"]

# Kendall tau between arms on survivors (same seeds => values should agree,
# so tau < 1 would indicate nondeterminism, itself worth knowing)
def kendall_tau(xs, ys):
    n = len(xs)
    if n < 2:
        return None
    conc = disc = 0
    for i in range(n):
        for j in range(i + 1, n):
            s = (xs[i] - xs[j]) * (ys[i] - ys[j])
            conc += s > 0
            disc += s < 0
    denom = n * (n - 1) / 2
    return (conc - disc) / denom

tau = kendall_tau(
    [none_by_n[n]["value"] for n in survivors],
    [med_by_n[n]["value"] for n in survivors],
)

fidelity = {
    "protocol": "same study twice (seed 42, RANDOM sampler => positional "
                "params identical across arms), 16 trials x 6 epochs, 128px "
                "SR vanilla tuner; arm A --pruner none (ground truth), "
                "arm B --pruner median",
    "direction": direction,
    "n_trials": len(common),
    "n_pruned_in_median_arm": len(pruned),
    "true_best_trial": truth[0],
    "true_best_value": none_by_n[truth[0]]["value"],
    "true_best_pruned": truth[0] in pruned,
    "median_arm_best_value": median["best_value"],
    "best_value_regret": (sign * (median["best_value"] - none["best_value"])
                          if median["best_value"] is not None else None),
    "ground_truth_ranks_pruned": sorted(rank_of[n] for n in pruned),
    "ground_truth_ranks_survived": sorted(rank_of[n] for n in survivors),
    "kendall_tau_on_survivors": tau,
}
(stage / "FIDELITY.json").write_text(json.dumps(fidelity, indent=2) + "\n")
print(json.dumps(fidelity, indent=2))
EOF
rm -rf "$DST"
mv "$STAGE" "$DST"
echo "=== DONE ==="
