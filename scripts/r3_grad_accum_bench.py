"""Gradient-accumulation throughput check on the real chip.

Two questions, same scan-diff timing method as bench.py:
1. Overhead: flagship (scale 0.5 / depth 3) bs32 at grad_accum 1 vs 4 —
   the scan should cost ~nothing (same FLOPs, one update either way).
2. Capacity: scale 0.8 / depth 5 (138M, remat_levels=2) — bs8 plain vs an
   effective batch of 32 via grad_accum=4 over micro-batches of 8. The
   plain bs32 variant does not fit HBM at this config; accumulation should
   deliver the 4x batch at roughly the bs8 img/s (same per-image FLOPs).

Usage: python scripts/r3_grad_accum_bench.py [--steps 4 12]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, nargs=2, default=[4, 12])
    args = parser.parse_args()

    from adunet.utils.runtime import setup_runtime

    setup_runtime()
    import jax
    import jax.numpy as jnp

    from adunet.losses import build_losses_and_metrics
    from adunet.models import build_super_resolution_unet
    from adunet.ops import degrade
    from adunet.train import create_train_state, make_optimizer
    from adunet.train.sr import DATA_LR_SHRINK, make_sr_train_step

    loss_fn, _ = build_losses_and_metrics("charbonnier")
    n_short, n_long = args.steps

    def throughput(model_kw, batch, accum, label):
        model, _ = build_super_resolution_unet(
            input_size=256, dtype=jnp.bfloat16, **model_kw
        )
        state = create_train_state(
            model, jax.random.key(0), jnp.zeros((1, 256, 256, 3)),
            make_optimizer(1e-4),
        )
        raw = make_sr_train_step(model, loss_fn, donate=False, grad_accum=accum)

        def make_runner(n_steps):
            @jax.jit
            def run(state, rng):
                def body(carry, _):
                    st, key = carry
                    key, sub = jax.random.split(key)
                    hr = jax.random.uniform(sub, (batch, 256, 256, 3), jnp.float32)
                    st, metrics = raw.__wrapped__(st, hr, None)
                    return (st, key), metrics["loss"]

                (state, _), losses = jax.lax.scan(
                    body, (state, rng), None, length=n_steps
                )
                return state, losses

            return run

        def timed(run, repeats=2):
            _, losses = run(state, jax.random.key(1))
            assert np.isfinite(float(np.asarray(losses).sum()))
            best = np.inf
            for _ in range(repeats):
                t0 = time.perf_counter()
                _, losses = run(state, jax.random.key(1))
                float(np.asarray(losses).sum())
                best = min(best, time.perf_counter() - t0)
            return best

        for _ in range(3):
            dt = timed(make_runner(n_long)) - timed(make_runner(n_short))
            if dt > 0:
                ips = batch * (n_long - n_short) / dt
                print(json.dumps({"config": label, "batch": batch,
                                  "grad_accum": accum,
                                  "imgs_per_sec": round(ips, 2)}), flush=True)
                return ips
        raise RuntimeError("scan-diff inverted repeatedly")

    flag = {"scale": 0.5, "depth_override": 3}
    deep = {"scale": 0.8, "depth_override": 5, "remat_levels": 2}

    throughput(flag, 32, 1, "flagship 0.5/d3")
    throughput(flag, 32, 4, "flagship 0.5/d3")
    throughput(deep, 8, 1, "deep 0.8/d5 sel2")
    throughput(deep, 32, 4, "deep 0.8/d5 sel2")
    print("=== DONE ===", flush=True)


if __name__ == "__main__":
    main()
