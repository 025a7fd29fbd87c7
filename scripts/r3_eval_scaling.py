"""Mesh-scaling probe for the sharded evaluator (VERDICT r2 #3).

Runs the offline evaluator's jitted metric tail over the same patch stream
on a 1-device and an 8-device CPU mesh (virtual devices) and reports
wall-clock per configuration.

IMPORTANT caveat, measured: virtual CPU devices
(`xla_force_host_platform_device_count=8`) all share the SAME physical core
pool, so total compute capacity is identical at every mesh size — an 8-way
sharded run cannot go faster than 1-way here (measured 0.84x: same FLOPs
plus partitioning overhead). The virtual mesh validates CORRECTNESS of the
sharded program (identical per-patch rows:
tests/test_golden_eval.py::test_evaluate_sr_sharded_matches_unsharded, and
the mesh-invariance assertions in __graft_entry__.dryrun_multichip); the
throughput claim rests on the structural fact that GSPMD partitions the
batch rows 1/N per device (so on N real chips each chip does 1/N of the
work) plus the real-chip absolute rate in bench.py's ``eval_imgs_per_sec``.

Usage:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/r3_eval_scaling.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import jax

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir", "/root/.cache/adunet_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp  # noqa: E402

from adunet.models import build_super_resolution_unet  # noqa: E402
from adunet.parallel import make_mesh, replicate  # noqa: E402
from adunet.parallel.mesh import batch_sharding  # noqa: E402
from adunet.train import create_train_state, make_optimizer  # noqa: E402
from adunet.train.sr import make_sr_eval_step  # noqa: E402


def main() -> None:
    size, batch, n_batches = 64, 32, 12
    model, _ = build_super_resolution_unet(
        scale=0.5, depth_override=2, input_size=size, base_channels=16
    )
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, size, size, 3)), make_optimizer(1e-4)
    )
    step = make_sr_eval_step(None, eval_scale=0.5, eval_shave=4)
    rng = np.random.default_rng(0)
    batches = [
        rng.random((batch, size, size, 3), dtype=np.float32) for _ in range(n_batches)
    ]

    results = {}
    for n_dev in (1, len(jax.devices())):
        mesh = make_mesh(n_dev)
        st = replicate(state, mesh)
        sharding = batch_sharding(mesh)
        put = lambda a: jax.device_put(a, sharding)  # noqa: E731
        # warmup/compile
        jax.block_until_ready(step(st, put(batches[0]))["psnr_y"])
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            for b in batches:
                out = step(st, put(b))
            jax.block_until_ready(out["psnr_y"])
            best = min(best, time.perf_counter() - t0)
        ips = batch * n_batches / best
        results[n_dev] = ips
        print(f"{n_dev} device(s): {ips:8.1f} patches/s ({best*1000:.0f} ms)")

    n = len(jax.devices())
    if n > 1:
        print(f"speedup {n}dev/1dev: {results[n] / results[1]:.2f}x")


if __name__ == "__main__":
    main()
