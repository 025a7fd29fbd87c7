#!/bin/bash
# Round-3: reference-length (100-epoch) flagship run on chip over the
# reproducible synthetic corpus, auto-eval, int8 AOT export — the artifacts
# back the regression goldens in tests/test_golden_eval.py (VERDICT r2 #1).
set -e
cd /root/repo
BASE=/tmp/r3flag
rm -rf $BASE && mkdir -p $BASE
python scripts/make_synth_corpus.py --out $BASE/train_hr --n 48 --size 512 --seed 0
python scripts/make_synth_corpus.py --out $BASE/eval_hr --n 12 --size 512 --seed 777

# depth_override 3 = the reference's checked-in scale-0.5 flagship config
# (E1/E2 sweeps pin depth; the pure geometric policy would pick 4 here)
python -m adunet.cli.train_sr --scale 0.5 --depth_override 3 --batch_size 32 \
  --epochs 100 --patches_per_image 16 --device_cache --patience 99 --mixed_precision \
  --high_res_dir $BASE/train_hr --model_dir $BASE/models --log_dir $BASE/logs \
  --run_name r3_flagship100 --seed 1234 2>&1 | tail -30

python -m adunet.cli.evaluate \
  --model-path $BASE/models/unet_adaptive_scale0.50_depth3 \
  --scale 0.5 --hr-dir $BASE/eval_hr --patch-size 256 --batch-size 16 \
  --output-dir $BASE/eval --run-name r3_flagship100_eval 2>&1 | tail -8

python -m adunet.cli.export_model \
  --model-path $BASE/models/unet_adaptive_scale0.50_depth3 \
  --scale 0.5 --patch-size 256 --batch-size 8 --quantize int8 \
  --output-dir $BASE/export_int8 2>&1 | tail -4

echo "=== artifacts ==="
cat $BASE/eval/r3_flagship100_eval/metrics.json
ls -la $BASE/export_int8
echo "=== DONE ==="
