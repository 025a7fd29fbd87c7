#!/bin/bash
# Collect the round-3 100-epoch flagship artifacts into the repo tree and
# pin the golden numbers (tests/test_golden_eval.py::test_flagship_100epoch_golden_artifact).
set -e
BASE=/tmp/r3flag
DST=/root/repo/experiments/round3_flagship
rm -rf $DST && mkdir -p $DST/evaluation $DST/export_int8 $DST/training
cp $BASE/eval/r3_flagship100_eval/metrics.json $DST/evaluation/
cp $BASE/eval/r3_flagship100_eval/per_patch.csv $DST/evaluation/ 2>/dev/null || true
cp -r $BASE/export_int8/. $DST/export_int8/
cp $BASE/logs/r3_flagship100/epoch_metrics.csv $DST/training/ 2>/dev/null || true
cp $BASE/logs/r3_flagship100/config.json $DST/training/ 2>/dev/null || \
  cp $BASE/models/unet_adaptive_scale0.50_depth3/config.json $DST/training/ 2>/dev/null || true
python - <<'EOF'
import json
from pathlib import Path
m = json.loads(Path("/root/repo/experiments/round3_flagship/evaluation/metrics.json").read_text())
golden = {k: m[k] for k in ("psnr_mean", "ssim_mean", "msssim_mean", "samples") if k in m}
Path("/root/repo/experiments/round3_flagship/GOLDEN.json").write_text(json.dumps(golden, indent=2) + "\n")
print("GOLDEN:", golden)
EOF
echo "collected into $DST"
find $DST -type f | wc -l
