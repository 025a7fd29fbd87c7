"""On-chip serving benchmark: f32 vs int8 weight-only exported artifacts.

Measures the production inference path the HTTP server (`adunet.cli.serve`)
sits on: a StableHLO artifact exported by `adunet.export` (reference's
deployment story is a Keras SavedModel reload; ours is an AOT program —
`Super_resolution/code/evaluate_model.py` reloads the .keras file per run).

Two timing views per artifact, both on the flagship SR forward
(scale 0.5 / depth 3, 256px tiles):

- ``sequential``: submit one batch, block, repeat — a latency-bound client.
  On this environment's remote-TPU tunnel the per-call RTT dominates, so
  this number is an upper bound on real colocated latency.
- ``pipelined``: submit all batches back-to-back, block once at the end —
  the server-under-load view (the micro-batcher keeps the queue full), which
  hides dispatch RTT behind device compute and approximates colocated
  throughput.

Also reports artifact size on disk (int8 ships conv kernels as int8 +
per-channel f32 scales; dequantize is staged into the program).

Usage: python scripts/r3_serving_bench.py [--batch 8] [--calls 24]
Appends one JSON line per artifact to stdout.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def dir_bytes(p: Path) -> int:
    return sum(f.stat().st_size for f in p.rglob("*") if f.is_file())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--patch", type=int, default=256)
    ap.add_argument("--calls", type=int, default=24)
    ap.add_argument("--out", type=str, default=None, help="optional JSONL path")
    args = ap.parse_args()

    from adunet.utils.runtime import setup_runtime

    setup_runtime()
    import os

    import jax

    # sitecustomize force-sets jax_platforms='axon,cpu'; honor an explicit
    # JAX_PLATFORMS override (e.g. =cpu for a hardware-free smoke run)
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    from adunet.export import export_sr_forward, load_artifact, save_artifact
    from adunet.models import build_super_resolution_unet
    from adunet.train import create_train_state, make_optimizer

    model, _ = build_super_resolution_unet(
        scale=0.5, depth_override=3, input_size=args.patch, dtype=jnp.bfloat16
    )
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, args.patch, args.patch, 3)),
        make_optimizer(1e-4),
    )
    # the SR model is identity-start (zero-init head), under which int8
    # weight error cancels exactly — perturb every leaf so the drift check
    # sees a non-trivial network, as a trained checkpoint would
    leaves, treedef = jax.tree_util.tree_flatten(state.params)
    keys = jax.random.split(jax.random.key(7), len(leaves))
    leaves = [
        l + 0.02 * jax.random.normal(k, l.shape, l.dtype) for l, k in zip(leaves, keys)
    ]
    state = state.replace(params=jax.tree_util.tree_unflatten(treedef, leaves))

    tiles = np.random.default_rng(0).random(
        (args.batch, args.patch, args.patch, 3), dtype=np.float32
    )
    results = []
    outputs = {}
    with tempfile.TemporaryDirectory() as tmp:
        for mode in (None, "int8"):
            name = mode or "f32"
            out_dir = Path(tmp) / name
            exported = export_sr_forward(
                state, patch_size=args.patch, batch_size=args.batch, quantize=mode
            )
            save_artifact(exported, out_dir, meta={"workload": "sr"})
            call, _manifest = load_artifact(out_dir)

            dev_tiles = jax.device_put(tiles)
            # warmup: compile + first execution (kept for the drift check)
            first_out = np.asarray(call(dev_tiles))

            # latency-bound client: block every call
            seq = []
            for _ in range(max(4, args.calls // 4)):
                t0 = time.perf_counter()
                np.asarray(call(dev_tiles))
                seq.append(time.perf_counter() - t0)

            # server under load: keep the device queue full, block once
            t0 = time.perf_counter()
            outs = [call(dev_tiles) for _ in range(args.calls)]
            jax.block_until_ready(outs)
            dt = time.perf_counter() - t0

            row = {
                "artifact": name,
                "batch": args.batch,
                "patch": args.patch,
                "artifact_mb": round(dir_bytes(out_dir) / 1e6, 2),
                "seq_ms_per_call": round(1e3 * float(np.median(seq)), 2),
                "pipelined_ms_per_call": round(1e3 * dt / args.calls, 2),
                "pipelined_tiles_per_sec": round(args.batch * args.calls / dt, 1),
            }
            results.append(row)
            outputs[name] = first_out
            print(json.dumps(row), flush=True)

        # numerical drift of weight-only int8 vs f32 on identical tiles
        if {"f32", "int8"} <= outputs.keys():
            diff = np.abs(outputs["int8"] - outputs["f32"])
            mse = float(np.mean((outputs["int8"] - outputs["f32"]) ** 2))
            drift = {
                "artifact": "int8_vs_f32_drift",
                "max_abs_diff": round(float(diff.max()), 6),
                "psnr_db": round(10 * np.log10(1.0 / mse), 2) if mse > 0 else float("inf"),
            }
            results.append(drift)
            print(json.dumps(drift), flush=True)

    if args.out:
        with open(args.out, "a") as fh:
            for row in results:
                fh.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
