"""Host-feed component diagnosis: where does the streamed path lose time?

Times three components of bench.py's host-feed program in isolation on the
flagship config (256px, bs32, uint8 wire format):

  host_assemble   pure loader rate (PNG decode + crop + shuffle + concat),
                  no device involved
  device_put      pure transfer bandwidth of pre-assembled super-batches
  device_step     the jitted train step fed from an on-device batch
                  (UNRELIABLE over the remote tunnel: per-dispatch timing
                  under-counts — use bench.py's scan-differenced number for
                  the step rate; this column is only a sanity floor)

host_feed_fraction is bounded above by min(host, put, step)/step; the
smallest component names the bottleneck.

Measured on the fifth-session 1-core host (2026-08-18):
  host_assemble 75.8 img/s | device_put 191.9 img/s (37.7 MB/s) | step 172.4
→ the streamed path was DECODE-bound (the infinite stream re-decodes the
corpus every pass); fixed by TrainingPatchDataset(cache_decoded=True).

Usage: python scripts/r3_host_feed_diag.py
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

PX = 256
BATCH = 32
CHUNK = 4
N_CHUNKS = 6
HOST_FEED_IMAGES = 24
HOST_FEED_IMAGE_PX = 512


def main() -> None:
    from adunet.utils.runtime import setup_runtime

    setup_runtime()
    import cv2
    import jax
    import jax.numpy as jnp

    from adunet.data import make_training_patch_dataset
    from adunet.losses import build_losses_and_metrics
    from adunet.models import build_super_resolution_unet
    from adunet.train import create_train_state, make_optimizer, make_sr_train_step
    from adunet.train.sr import DATA_LR_SHRINK

    tmp = tempfile.mkdtemp()
    rng_np = np.random.default_rng(0)
    paths = []
    for i in range(HOST_FEED_IMAGES):
        img = (rng_np.random((HOST_FEED_IMAGE_PX, HOST_FEED_IMAGE_PX, 3)) * 255).astype(
            np.uint8
        )
        p = Path(tmp) / f"bench{i:03d}.png"
        cv2.imwrite(str(p), img)
        paths.append(str(p))

    def fresh_iter():
        ds, _ = make_training_patch_dataset(
            paths, patch_size=PX, patches_per_image=8,
            scale=DATA_LR_SHRINK, batch_size=BATCH, seed=0,
            shuffle_buffer=256, output_dtype="uint8",
        )
        return iter(ds)

    out = {}

    # (a) host assemble alone
    it = fresh_iter()
    next(it)  # warm: fills shuffle buffer
    t0 = time.perf_counter()
    batches = [next(it) for _ in range(N_CHUNKS * CHUNK)]
    dt = time.perf_counter() - t0
    out["host_assemble_imgs_per_sec"] = round(BATCH * N_CHUNKS * CHUNK / dt, 2)

    # (b) pure device_put bandwidth of super-batches (reuse decoded batches)
    supers = [
        np.concatenate(batches[i * CHUNK:(i + 1) * CHUNK], axis=0)
        for i in range(N_CHUNKS)
    ]
    jax.device_put(supers[0]).block_until_ready()  # warm
    best_put = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        handles = [jax.device_put(s) for s in supers]
        for h in handles:
            h.block_until_ready()
        dt = time.perf_counter() - t0
        best_put = max(best_put, BATCH * N_CHUNKS * CHUNK / dt)
    out["device_put_imgs_per_sec"] = round(best_put, 2)
    mb = supers[0].nbytes / 1e6
    out["superbatch_mb"] = round(mb, 2)
    out["device_put_mb_per_sec"] = round(best_put / BATCH / CHUNK * mb, 1)

    # (c) device step rate on resident batches (chunked scan, same as bench)
    model, _ = build_super_resolution_unet(
        scale=0.5, depth_override=3, input_size=PX, dtype=jnp.bfloat16
    )
    loss_fn, _ = build_losses_and_metrics("charbonnier")
    step = make_sr_train_step(model, loss_fn)
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, PX, PX, 3)), make_optimizer(1e-4)
    )

    @jax.jit
    def run_chunk(state, superbatch):
        def body(st, sub):
            st, metrics = step.__wrapped__(st, sub, None)
            return st, metrics["loss"]

        sb = superbatch.reshape(CHUNK, BATCH, PX, PX, superbatch.shape[-1])
        return jax.lax.scan(body, state, sb)

    dev_supers = [jax.device_put(s) for s in supers]
    state, losses = run_chunk(state, dev_supers[0])
    losses.block_until_ready()
    t0 = time.perf_counter()
    for sb in dev_supers:
        state, losses = run_chunk(state, sb)
    losses.block_until_ready()
    dt = time.perf_counter() - t0
    out["device_step_imgs_per_sec"] = round(BATCH * N_CHUNKS * CHUNK / dt, 2)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
