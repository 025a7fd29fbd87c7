"""Single-chip benchmark: vmapped trial lanes vs sequential trials.

The mesh-parallel tuner (adunet/tune/parallel.py) was built to spread trial
lanes across devices, but lane-stacking also pays off on ONE chip in two
ways: (1) each train step becomes one dispatch advancing K trials, so the
host->device round trip (substantial through this environment's tunnel, and
nonzero on any real deployment) is amortized K-fold; (2) small per-trial
batches underfill the MXU, and the stacked lanes give XLA K-fold more
parallel work per launch. The reference's optuna flow
(u_net_vanilla_optuna.py:331, n_jobs=1) has neither lever.

Protocol: K same-batch-size configs on the reference search space's fixed
vanilla U-Net; both paths run through BatchedVanillaSRTuner.run_group so the
per-lane math is identical (the CPU suite asserts lane==sequential
exactness). Both programs are fully warmed (one throwaway run each) before
timing. Writes JSON lines to experiments/round3_sweep/ by default.

Usage:
  python scripts/r3_tune_parallel_bench.py                 # chip run
  JAX_PLATFORMS=cpu python scripts/r3_tune_parallel_bench.py --smoke
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=8)
    ap.add_argument("--image_size", type=int, default=128)
    ap.add_argument("--n_images", type=int, default=200)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--base_channels", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--smoke", action="store_true",
                    help="Tiny shapes for a hardware-free correctness pass.")
    ap.add_argument("--out", type=str,
                    default="experiments/round3_sweep/tune_parallel_bench.jsonl")
    args = ap.parse_args()
    if args.smoke:
        args.trials, args.image_size, args.n_images = 4, 32, 24
        args.base_channels, args.epochs = 8, 1

    from adunet.utils.runtime import first_contact_watchdog, setup_runtime

    setup_runtime()
    disarm = first_contact_watchdog()

    import jax
    import jax.numpy as jnp

    jnp.ones((8, 8)).sum().block_until_ready()
    disarm()

    from adunet.losses import make_perceptual_fn
    from adunet.ops import degrade
    from adunet.tune import BatchedVanillaSRTuner
    from adunet.utils import split_indices

    rng = np.random.default_rng(args.seed)
    hr = rng.random((args.n_images, args.image_size, args.image_size, 3),
                    dtype=np.float32)
    lr = np.asarray(jax.jit(jax.vmap(lambda h: degrade(h, 0.5, args.image_size)))(
        jnp.asarray(hr)))
    tr_idx, va_idx, _ = split_indices(args.n_images, 0.8, 0.2, 0.0, args.seed)

    # deterministic configs spanning the reference search space
    cfg_rng = np.random.default_rng(args.seed + 1)
    configs = [
        {
            "lr": float(10 ** cfg_rng.uniform(-5, np.log10(5e-3))),
            "alpha": float(cfg_rng.uniform(0.5, 2.0)),
            "beta": float(10 ** cfg_rng.uniform(-3, np.log10(0.5))),
            "gamma": float(10 ** cfg_rng.uniform(-4, -1)),
        }
        for _ in range(args.trials)
    ]

    tuner = BatchedVanillaSRTuner(
        lr, hr, tr_idx, va_idx, base_channels=args.base_channels,
        seed=args.seed, perceptual_fn=make_perceptual_fn(input_size=args.image_size),
        mesh=None,
    )

    def run_sequential():
        return [tuner.run_group([c], args.batch_size, args.epochs)[0]
                for c in configs]

    def run_batched():
        return tuner.run_group(configs, args.batch_size, args.epochs)

    # warm both programs (compile + cache); discard results
    run_batched()
    run_sequential()

    t0 = time.monotonic()
    seq_curves = run_sequential()
    seq_s = time.monotonic() - t0

    t0 = time.monotonic()
    bat_curves = run_batched()
    bat_s = time.monotonic() - t0

    # Per-lane math is identical by construction (the CPU suite asserts
    # bit-level lane==sequential exactness). On TPU the two programs lower
    # differently (feature_group_count=K grouped conv vs plain conv) and f32
    # convs run bf16-input MXU passes, so dozens of Adam steps amplify
    # summation-order noise — report absolute AND relative drift plus both
    # curve tails so precision chaos can't masquerade as a logic bug.
    max_delta = max(
        abs(a - b)
        for ca, cb in zip(seq_curves, bat_curves)
        for a, b in zip(ca, cb)
    )
    max_rel = max(
        abs(a - b) / max(abs(a), abs(b), 1e-12)
        for ca, cb in zip(seq_curves, bat_curves)
        for a, b in zip(ca, cb)
    )

    steps = args.epochs * ((len(tr_idx) + args.batch_size - 1) // args.batch_size)
    rows = [
        {"mode": "sequential", "trials": args.trials, "wall_s": round(seq_s, 3),
         "train_steps_per_trial": steps},
        {"mode": "batched_lanes", "trials": args.trials, "wall_s": round(bat_s, 3),
         "train_steps_per_trial": steps},
        {"mode": "summary", "speedup": round(seq_s / bat_s, 2),
         "max_curve_delta": float(max_delta), "max_rel_delta": float(max_rel),
         "smoke": args.smoke,
         "image_size": args.image_size, "batch_size": args.batch_size,
         "base_channels": args.base_channels, "n_devices": jax.device_count()},
        {"mode": "curves", "sequential_final": [round(c[-1], 5) for c in seq_curves],
         "batched_final": [round(c[-1], 5) for c in bat_curves]},
    ]
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    with out.open("a") as f:
        for r in rows:
            print(json.dumps(r))
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
