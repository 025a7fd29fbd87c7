"""Round-3 deep-config performance sweep (VERDICT r2 #4).

Measures the scale-0.7/0.8 depth-5 (138M-param) training step on the real
chip across rematerialisation policies and batch sizes, using the same
scan-diff timing bench.py uses (difference a short and a long jitted scan to
cancel fixed dispatch/transfer overhead).

Usage:  python scripts/r3_perf_deep.py [--scales 0.8 0.7] [--steps 12 36]
Writes one JSON line per config to stdout and a summary table at the end.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

# runnable from anywhere without PYTHONPATH (which breaks the TPU plugin
# registration in this image)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--scales", type=float, nargs="*", default=[0.8])
    parser.add_argument("--steps", type=int, nargs=2, default=[6, 18])
    parser.add_argument("--policies", type=str, nargs="*", default=None)
    parser.add_argument("--batches", type=int, nargs="*", default=[8])
    args = parser.parse_args()

    from adunet.utils.runtime import setup_runtime

    setup_runtime()
    import jax
    import jax.numpy as jnp

    from adunet.losses import build_losses_and_metrics
    from adunet.models import build_super_resolution_unet
    from adunet.ops import degrade
    from adunet.train import create_train_state, make_optimizer
    from adunet.train.sr import DATA_LR_SHRINK, sr_loss_and_metrics

    loss_fn, _ = build_losses_and_metrics("charbonnier")
    n_short, n_long = args.steps

    def throughput(scale, batch, remat_kw):
        model, _ = build_super_resolution_unet(
            scale=scale, depth_override=5, input_size=256, dtype=jnp.bfloat16,
            **remat_kw,
        )

        def one_step(state, rng):
            hr = jax.random.uniform(rng, (batch, 256, 256, 3), dtype=jnp.float32)
            lr = degrade(hr, DATA_LR_SHRINK, 256)

            def compute_loss(params):
                pred = state.apply_fn({"params": params}, lr)
                loss, _m = sr_loss_and_metrics(loss_fn, hr, pred)
                return loss

            loss, grads = jax.value_and_grad(compute_loss)(state.params)
            return state.apply_gradients(grads=grads), loss

        def runner(n):
            @jax.jit
            def run(state, rng):
                def body(carry, _):
                    st, key = carry
                    key, sub = jax.random.split(key)
                    st, loss = one_step(st, sub)
                    return (st, key), loss

                (state, _), losses = jax.lax.scan(
                    body, (state, rng), None, length=n
                )
                return state, losses

            return run

        state = create_train_state(
            model, jax.random.key(0), jnp.zeros((1, 256, 256, 3)),
            make_optimizer(1e-4),
        )

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
            t_s = timed(runner(n_short))
            t_l = timed(runner(n_long))
            if t_l > t_s:
                return batch * (n_long - n_short) / (t_l - t_s)
        raise RuntimeError("scan-diff inverted repeatedly")

    # 'none' is omitted by default: the 138M no-remat config OOMs after
    # paying a full (multi-minute, remote) compile. Pass --policies to widen.
    policies = {
        "all": dict(remat=True),
        "sel2": dict(remat_levels=2),
        "sel3": dict(remat_levels=3),
        "sel4": dict(remat_levels=4),
    }
    if args.policies:
        extra = {"none": dict(remat=False), "sel1": dict(remat_levels=1)}
        policies = {k: (policies | extra)[k] for k in args.policies}
    rows = []
    for scale in args.scales:
        for name, kw in policies.items():
            for batch in args.batches:
                tag = f"scale{scale}/d5/{name}/bs{batch}"
                try:
                    ips = throughput(scale, batch, kw)
                    ms = 1000.0 * batch / ips
                    rows.append((tag, ips, ms))
                    print(json.dumps(
                        {"config": tag, "imgs_per_sec": round(ips, 2),
                         "ms_per_step": round(ms, 1)}), flush=True)
                except Exception as exc:  # OOM etc: record and move on
                    rows.append((tag, None, None))
                    print(json.dumps({"config": tag, "error": str(exc)[:200]}),
                          flush=True)

    print("\n=== summary (img/s) ===")
    for tag, ips, ms in rows:
        print(f"{tag:32s} {ips if ips else 'FAIL':>10} " +
              (f"({ms} ms/step)" if ms else ""))


if __name__ == "__main__":
    main()
