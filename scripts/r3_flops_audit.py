"""XLA cost-analysis audit of the SR train step (round 3, VERDICT r2 #4).

Asks the compiler itself how many FLOPs each config's jitted train step
executes (``compiled.cost_analysis()['flops']``) and converts the measured
throughput (scripts/r3_perf_deep.py / bench.py) into achieved TFLOP/s and
MXU utilisation against the v5e bf16 peak. This turns the "deep configs are
near speed-of-light" claim into compiler-certified arithmetic rather than a
hand count.

Runs on CPU (compile-only; nothing is executed), so it does not need the
chip. Usage: python scripts/r3_flops_audit.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

V5E_PEAK_BF16_TFLOPS = 197.0  # TPU v5e: 197 TFLOP/s bf16 per chip

# measured on chip (scripts/r3_perf_deep.py, bench.py BENCH_r02/r03)
MEASURED_IMGS_PER_SEC = {
    ("0.5/d3", 32): 172.4,
    ("0.8/d5-sel2", 8): 14.18,
    ("0.7/d5-sel2", 8): 35.03,
}


def main() -> None:
    import jax
    import jax.numpy as jnp

    from adunet.losses import build_losses_and_metrics
    from adunet.models import build_super_resolution_unet
    from adunet.ops import degrade
    from adunet.train import create_train_state, make_optimizer
    from adunet.train.sr import DATA_LR_SHRINK, sr_loss_and_metrics

    loss_fn, _ = build_losses_and_metrics("charbonnier")

    def audit(tag, scale, depth, batch, remat_kw):
        model, _ = build_super_resolution_unet(
            scale=scale, depth_override=depth, input_size=256,
            dtype=jnp.bfloat16, **remat_kw,
        )
        state = create_train_state(
            model, jax.random.key(0), jnp.zeros((1, 256, 256, 3)),
            make_optimizer(1e-4),
        )

        def step(state, hr):
            lr = degrade(hr, DATA_LR_SHRINK, 256)

            def compute_loss(params):
                pred = state.apply_fn({"params": params}, lr)
                loss, _m = sr_loss_and_metrics(loss_fn, hr, pred)
                return loss

            loss, grads = jax.value_and_grad(compute_loss)(state.params)
            return state.apply_gradients(grads=grads), loss

        hr = jnp.zeros((batch, 256, 256, 3), jnp.float32)
        compiled = jax.jit(step).lower(state, hr).compile()
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops = float(cost["flops"])
        row = {
            "config": tag,
            "batch": batch,
            "tflops_per_step": round(flops / 1e12, 3),
            "tflops_per_img": round(flops / batch / 1e12, 3),
        }
        ips = MEASURED_IMGS_PER_SEC.get((tag, batch))
        if ips:
            achieved = ips * flops / batch / 1e12
            row |= {
                "measured_imgs_per_sec": ips,
                "achieved_tflops_per_sec": round(achieved, 1),
                "mxu_utilisation_vs_bf16_peak": round(achieved / V5E_PEAK_BF16_TFLOPS, 3),
                "speed_of_light_imgs_per_sec": round(
                    V5E_PEAK_BF16_TFLOPS / (flops / batch / 1e12), 1),
            }
        print(json.dumps(row), flush=True)
        return row

    audit("0.5/d3", 0.5, 3, 32, dict(remat=False))
    audit("0.7/d5-sel2", 0.7, 5, 8, dict(remat_levels=2))
    audit("0.8/d5-sel2", 0.8, 5, 8, dict(remat_levels=2))
    audit("0.8/d5-all", 0.8, 5, 8, dict(remat=True))


if __name__ == "__main__":
    main()
