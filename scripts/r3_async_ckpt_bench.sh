#!/bin/bash
# Round-3: measure --async_checkpoint on chip. Same 12-epoch flagship config
# twice (warm compile cache from the 100-epoch run); the per-epoch Orbax save
# was ~2.5-3.0 s of a ~7 s epoch wall in that run's tail instrumentation.
set -e
cd /root/repo
BASE=/tmp/r3flag     # reuse the flagship corpus
[ -d $BASE/train_hr ] || python scripts/make_synth_corpus.py --out $BASE/train_hr --n 48 --size 512 --seed 0

run () {  # $1 = run name, $2 = extra flags
  rm -rf /tmp/r3async_$1
  T0=$(date +%s)
  python -m adunet.cli.train_sr \
    --scale 0.5 --depth_override 3 --batch_size 32 --epochs 12 \
    --patches_per_image 16 --device_cache --patience 99 --mixed_precision \
    --high_res_dir $BASE/train_hr --model_dir /tmp/r3async_$1/models \
    --log_dir /tmp/r3async_$1/logs --run_name bench_$1 --seed 77 $2 2>&1 \
    | grep -E "Epoch (1|12)/|epoch tail" | tail -6 || true
  echo "TOTAL_WALL_$1 $(( $(date +%s) - T0 )) s"
}

echo "=== sync (default) ==="
run sync ""
echo "=== async ==="
run async "--async_checkpoint"
echo "=== DONE ==="
