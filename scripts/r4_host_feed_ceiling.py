"""Wire-independent host-feed ceiling (round 4, VERDICT r3 #5).

BENCH_r03 measured the streamed host feed at 0.79-0.84 of device-only
throughput on the chip, attributed to the environment's 7-40 MB/s transfer
tunnel (scripts/r3_host_feed_diag.py). This script removes the wire from the
equation: the IDENTICAL loader stack (threaded TrainingPatchDataset,
uint8 wire format, cache_decoded, CHUNK-step super-batches, double-buffered
device_put) feeds a LOCAL CPU device, and the training step is emulated by a
throttled consumer that holds each super-batch for exactly the time the real
chip takes (chunk_imgs / target_rate seconds). If the loader can keep a
consumer running at the flagship's 172 img/s with >= 0.95 fraction when
transfer costs a memcpy instead of a tunnel, the residual chip gap is
conclusively the environment, not the loader.

Run: JAX_PLATFORMS=cpu python scripts/r4_host_feed_ceiling.py
Writes experiments/round4_sweep/host_feed_ceiling/HOST_FEED_CEILING.json.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

PX = 256
BATCH = 32
CHUNK = 4  # steps per super-batch, as bench.py's host-feed path
N_CHUNKS = 24  # measured steps = 96
CORPUS_IMAGES = 24
CORPUS_PX = 512
FLAGSHIP_RATE = 172.4  # BENCH_r03 device-only img/s (the rate to keep fed)


def main() -> None:
    import jax

    from adunet.data import make_training_patch_dataset
    from adunet.train.sr import DATA_LR_SHRINK
    from adunet.utils.runtime import honor_env_platforms

    honor_env_platforms()

    with tempfile.TemporaryDirectory() as tmp:
        rng_np = np.random.default_rng(0)
        paths = []
        import cv2

        for i in range(CORPUS_IMAGES):
            img = (rng_np.random((CORPUS_PX, CORPUS_PX, 3)) * 255).astype(np.uint8)
            p = Path(tmp) / f"bench{i:03d}.png"
            cv2.imwrite(str(p), img)
            paths.append(str(p))

        def fresh_iter():
            ds, _n = make_training_patch_dataset(
                paths, patch_size=PX, patches_per_image=8,
                scale=DATA_LR_SHRINK, batch_size=BATCH, seed=0,
                shuffle_buffer=256, output_dtype="uint8", cache_decoded=True,
            )
            return iter(ds)

        def measure(target_rate: float | None) -> dict:
            """Feed an emulated device running at target_rate img/s.

            The real fit loop dispatches each chunk's compute ASYNCHRONOUSLY
            (the host never blocks on device compute, only on data), so the
            device timeline is modelled, not slept: chunk k starts at
            max(data_ready_k, device_free), runs chunk_imgs/target_rate
            seconds. achieved = imgs / device_busy_window — it reaches the
            target iff the loader never starves the emulated device.
            target_rate=None: drain the loader flat out (its own ceiling).
            """
            it = fresh_iter()

            def assemble():
                return np.concatenate([next(it) for _ in range(CHUNK)], axis=0)

            # one full corpus pass so the decoded cache is hot, as bench.py
            warm = max(CHUNK, -(-CORPUS_IMAGES * 8 // BATCH))
            for _ in range(-(-warm // CHUNK)):
                np.asarray(jax.device_put(assemble())).ravel()[0]

            chunk_imgs = CHUNK * BATCH
            hold = (chunk_imgs / target_rate) if target_rate else 0.0
            with ThreadPoolExecutor(max_workers=2) as pool:
                pending = deque(
                    pool.submit(jax.device_put, assemble()) for _ in range(2)
                )
                t0 = time.perf_counter()
                device_free = t0
                starved_s = 0.0
                for _ in range(N_CHUNKS):
                    sb = pending.popleft().result()
                    pending.append(pool.submit(jax.device_put, assemble()))
                    _ = np.asarray(sb).ravel()[0]  # materialised = transferred
                    data_ready = time.perf_counter()
                    start = max(data_ready, device_free)
                    starved_s += max(0.0, data_ready - device_free)
                    device_free = start + hold
                dt = (device_free if hold else time.perf_counter()) - t0
                for f in pending:
                    f.result()
            achieved = chunk_imgs * N_CHUNKS / dt
            row = {
                "target_imgs_per_sec": target_rate,
                "achieved_imgs_per_sec": round(achieved, 2),
            }
            if target_rate:
                row["fraction_of_target"] = round(achieved / target_rate, 4)
                row["device_starved_s"] = round(starved_s, 3)
            return row

        results = {
            "protocol": (
                f"threaded TrainingPatchDataset (uint8, cache_decoded) over "
                f"{CORPUS_IMAGES}x{CORPUS_PX}px PNGs -> {CHUNK}-step super-batches "
                f"(batch {BATCH}) -> double-buffered device_put to a LOCAL CPU "
                f"device -> consumer throttled to the target rate; "
                f"{N_CHUNKS * CHUNK} measured steps, nproc={os.cpu_count()}"
            ),
            "loader_unthrottled": measure(None),
            "flagship_rate": measure(FLAGSHIP_RATE),
            "flagship_rate_x1.5": measure(FLAGSHIP_RATE * 1.5),
            "flagship_rate_x2": measure(FLAGSHIP_RATE * 2.0),
        }

    out_dir = Path(__file__).resolve().parents[1] / "experiments" / "round4_sweep" / "host_feed_ceiling"
    out_dir.mkdir(parents=True, exist_ok=True)
    (out_dir / "HOST_FEED_CEILING.json").write_text(json.dumps(results, indent=2) + "\n")
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
