"""Host-feed scheduling sweep on the real chip: CHUNK x DEPTH grid.

The round-3 bench reached host_feed_fraction 0.837 with CHUNK=4 (steps per
super-batch / jitted scan) and DEPTH=2 (in-flight device_put workers). This
sweeps both knobs to find where the tunnel saturates, so bench.py's defaults
can be set from measurement instead of guesswork.

Per cell: the flagship train step (scale 0.5 / depth 3, 256px, bs32) fed
from the threaded uint8 patch loader over a synthetic PNG corpus — exactly
bench.py's run_host_feed_bench with (CHUNK, DEPTH) parameterised.

Usage: python scripts/r3_host_feed_tune.py [--out FILE.jsonl]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

PX = 256
HOST_FEED_IMAGES = 24
HOST_FEED_IMAGE_PX = 512
BATCH = 32


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--n_chunks", type=int, default=6,
                    help="timed super-batches per cell")
    args = ap.parse_args()

    from adunet.utils.runtime import setup_runtime

    setup_runtime()
    import os

    import jax
    import jax.numpy as jnp

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from adunet.data import make_training_patch_dataset
    from adunet.losses import build_losses_and_metrics
    from adunet.models import build_super_resolution_unet
    from adunet.train import create_train_state, make_optimizer, make_sr_train_step
    from adunet.train.sr import DATA_LR_SHRINK

    model, _ = build_super_resolution_unet(
        scale=0.5, depth_override=3, input_size=PX, dtype=jnp.bfloat16
    )
    loss_fn, _ = build_losses_and_metrics("charbonnier")
    step = make_sr_train_step(model, loss_fn)

    import cv2

    tmp = tempfile.mkdtemp()
    rng_np = np.random.default_rng(0)
    paths = []
    for i in range(HOST_FEED_IMAGES):
        img = (rng_np.random((HOST_FEED_IMAGE_PX, HOST_FEED_IMAGE_PX, 3)) * 255).astype(np.uint8)
        p = Path(tmp) / f"bench{i:03d}.png"
        cv2.imwrite(str(p), img)
        paths.append(str(p))

    results = []

    def cell(chunk: int, depth: int) -> float:
        ds, _n = make_training_patch_dataset(
            paths, patch_size=PX, patches_per_image=8,
            scale=DATA_LR_SHRINK, batch_size=BATCH, seed=0,
            shuffle_buffer=256, output_dtype="uint8",
        )
        state = create_train_state(
            model, jax.random.key(0), jnp.zeros((1, PX, PX, 3)), make_optimizer(1e-4)
        )
        it = iter(ds)

        @jax.jit
        def run_chunk(state, superbatch):
            def body(st, sub_batch):
                st, metrics = step.__wrapped__(st, sub_batch, None)
                return st, metrics["loss"]

            sb = superbatch.reshape(chunk, BATCH, PX, PX, superbatch.shape[-1])
            return jax.lax.scan(body, state, sb)

        def assemble():
            return np.concatenate([next(it) for _ in range(chunk)], axis=0)

        state, losses = run_chunk(state, jax.device_put(assemble()))
        float(np.asarray(losses).sum())

        best = 0.0
        for _ in range(2):  # best-of-2 vs tunnel variance
            with ThreadPoolExecutor(max_workers=depth) as pool:
                pending = deque(
                    pool.submit(jax.device_put, assemble()) for _ in range(depth)
                )
                t0 = time.perf_counter()
                for _ in range(args.n_chunks):
                    sb = pending.popleft().result()
                    pending.append(pool.submit(jax.device_put, assemble()))
                    state, losses = run_chunk(state, sb)
                float(np.asarray(losses).sum())
                dt = time.perf_counter() - t0
                for f in pending:
                    f.result()
            best = max(best, BATCH * args.n_chunks * chunk / dt)
        return best

    for chunk in (4, 8, 16):
        for depth in (2, 3, 4):
            ips = cell(chunk, depth)
            row = {"chunk": chunk, "depth": depth,
                   "imgs_per_sec": round(ips, 2)}
            results.append(row)
            print(json.dumps(row), flush=True)

    if args.out:
        with open(args.out, "a") as fh:
            for row in results:
                fh.write(json.dumps(row) + "\n")
    print("=== DONE ===", flush=True)


if __name__ == "__main__":
    main()
