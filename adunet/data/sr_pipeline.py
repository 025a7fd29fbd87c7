"""SR patch pipelines: random-patch training stream, grid-tile eval stream.

Rebuild of shared/pipeline.py:177-288 with the TPU-native split of work:
the host decodes images and slices HR patches (threaded, overlapped with
device compute); the LR degradation — cv2-exact area-down + cubic-up — runs
*on device inside the jitted train/eval step* (adunet.ops.degrade), so the
hot path feeds HBM-resident batches instead of doing per-patch cv2 calls on
the Python side (reference HOT LOOP #1, SURVEY.md §3.1).

Semantics preserved:
- infinite stream, file list reshuffled per pass, ``patches_per_image``
  random crops per image, shuffle buffer (default 1024), batch,
  ``total_patches = len(files) * patches_per_image`` per epoch;
- finite grid tiling with stride + bottom-right fallback patch and
  ``"<file>#patch0007"`` labels.
"""

from __future__ import annotations

import math
import queue
import threading
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from adunet.data.io import load_rgb_image_full, load_rgb_image_full_u8, read_image_size
from adunet.data.patches import grid_patch_count, grid_patches, random_patches

__all__ = [
    "TrainingPatchDataset",
    "GridPatchDataset",
    "make_training_patch_dataset",
    "make_eval_patch_dataset",
]


class TrainingPatchDataset:
    """Infinite iterator of (B, P, P, 3) float32 HR patch batches.

    ``scale`` is carried as metadata: the train step degrades on device with
    it (the reference degrades on host at DATA_LR_SHRINK=0.5 regardless of
    model scale — train_adaptive_unet.py:60,438; we keep that contract at the
    caller level).
    """

    def __init__(
        self,
        hr_files: Sequence[str],
        patch_size: int,
        patches_per_image: int,
        scale: float,
        batch_size: int,
        seed: int,
        shuffle_buffer: int = 1024,
        prefetch_batches: int = 4,
        output_dtype: str = "float32",
        cache_decoded: bool = False,
    ):
        hr_files = list(hr_files)
        if not hr_files:
            raise ValueError("empty hr_files list: need at least one training image.")
        if patches_per_image <= 0:
            raise ValueError("patches_per_image: expected a value >= 1.")
        if patch_size <= 0:
            raise ValueError("patch_size: expected a value >= 1.")
        if output_dtype not in ("float32", "uint8"):
            raise ValueError("output_dtype must be 'float32' or 'uint8'.")
        self.hr_files = hr_files
        self.patch_size = patch_size
        self.patches_per_image = patches_per_image
        self.scale = float(scale)
        self.batch_size = batch_size
        self.seed = seed
        self.shuffle_buffer = shuffle_buffer
        self.prefetch_batches = prefetch_batches
        # uint8 keeps the wire format 4x smaller; the jitted step normalises
        # to [0,1] f32 on device (images are uint8 at the source anyway)
        self.output_dtype = output_dtype
        # tf.data .cache() equivalent: decode each image ONCE and keep the
        # pixel array in host RAM for all later epoch passes. The stream is
        # infinite, so without this every pass re-decodes the whole corpus —
        # on decode-bound hosts that caps the feed rate far below the device
        # step rate. Memory = the decoded corpus (DIV2K-800 ≈ 6.6 GB f32 /
        # 1.7 GB uint8 — host RAM scale, not HBM scale; see --device_cache
        # for the HBM-resident variant).
        self.cache_decoded = cache_decoded
        self._decoded_cache: dict = {}
        self.total_patches = len(hr_files) * patches_per_image
        self.steps_per_epoch = math.ceil(self.total_patches / batch_size)

    def _patch_stream(self, rng: np.random.Generator) -> Iterator[np.ndarray]:
        """Decode images with a small thread pool (cv2 releases the GIL), a
        sliding window of pending decodes ahead of the consumer."""
        files = list(self.hr_files)
        window = 4
        decode = (
            load_rgb_image_full_u8 if self.output_dtype == "uint8" else load_rgb_image_full
        )

        if self.cache_decoded:
            cache = self._decoded_cache

            def loader(path: str) -> np.ndarray:
                hit = cache.get(path)
                if hit is None:
                    # racing threads may decode the same file once each on the
                    # first pass; both writes store identical pixels, so the
                    # dict needs no lock (GIL-atomic assignment).
                    hit = cache[path] = decode(path)
                return hit
        else:
            loader = decode

        with ThreadPoolExecutor(max_workers=window) as pool:
            while True:
                rng.shuffle(files)
                pending = deque()
                idx = 0
                while idx < len(files) or pending:
                    while idx < len(files) and len(pending) < window:
                        pending.append(pool.submit(loader, files[idx]))
                        idx += 1
                    image = pending.popleft().result()
                    for patch in random_patches(
                        image, self.patch_size, count=self.patches_per_image, rng=rng
                    ):
                        yield patch

    def _batch_stream(self) -> Iterator[np.ndarray]:
        rng = np.random.default_rng(self.seed)
        stream = self._patch_stream(rng)
        buffer: List[np.ndarray] = []
        # fill shuffle buffer, then sample-with-replacement-free like tf.data
        while True:
            while len(buffer) < max(self.shuffle_buffer, self.batch_size):
                buffer.append(next(stream))
            batch = []
            for _ in range(self.batch_size):
                idx = int(rng.integers(0, len(buffer)))
                batch.append(buffer[idx])
                buffer[idx] = buffer[-1]
                buffer.pop()
            yield np.stack(batch, axis=0)

    def __iter__(self) -> Iterator[np.ndarray]:
        """Background-thread producer so host IO overlaps device compute."""
        q: queue.Queue = queue.Queue(maxsize=self.prefetch_batches)
        stop = threading.Event()

        def put_or_stop(item) -> bool:
            """Timeout-put so the thread can exit when the consumer abandons
            iteration while the queue is full — a bare q.put() would block
            forever and leak the thread plus its decode pool per iterator."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def producer() -> None:
            try:
                for batch in self._batch_stream():
                    if not put_or_stop(batch):
                        return
            except Exception as exc:  # surface loader errors to the consumer
                put_or_stop(exc)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()


class GridPatchDataset:
    """Finite iterator of (B, P, P, 3) HR patch batches with patch labels."""

    def __init__(
        self,
        hr_files: Sequence[str],
        patch_size: int,
        scale: float,
        batch_size: int,
        stride: Optional[int] = None,
    ):
        hr_files = list(hr_files)
        if not hr_files:
            raise ValueError("empty hr_files list: need at least one training image.")
        stride = stride or patch_size
        if stride <= 0:
            raise ValueError("stride: expected a value >= 1.")
        self.hr_files = hr_files
        self.patch_size = patch_size
        self.scale = float(scale)
        self.batch_size = batch_size
        self.stride = stride

        # label pass: closed-form patch count from image headers — no pixel
        # decode here (fixes the reference's decode-everything-twice quirk,
        # shared/pipeline.py:279-287)
        self.patch_labels: List[str] = []
        self._per_file_counts: List[int] = []
        for path in hr_files:
            h, w = read_image_size(path)
            n = grid_patch_count(h, w, patch_size, stride=stride, drop_remainder=False)
            self._per_file_counts.append(n)
            stem = Path(path).name
            self.patch_labels.extend(f"{stem}#patch{i:04d}" for i in range(n))
        self.total_patches = len(self.patch_labels)

    def __iter__(self) -> Iterator[np.ndarray]:
        pending: List[np.ndarray] = []
        count = 0
        for path in self.hr_files:
            image = load_rgb_image_full(path)
            tiles = grid_patches(image, self.patch_size, stride=self.stride, drop_remainder=False)
            for patch in tiles:
                pending.append(patch)
                count += 1
                if len(pending) == self.batch_size:
                    yield np.stack(pending, axis=0)
                    pending = []
        if pending:
            yield np.stack(pending, axis=0)


def make_training_patch_dataset(
    hr_files: Sequence[str],
    patch_size: int,
    patches_per_image: int,
    scale: float,
    batch_size: int,
    seed: int,
    shuffle_buffer: int = 1024,
    output_dtype: str = "float32",
    cache_decoded: bool = False,
) -> Tuple[TrainingPatchDataset, int]:
    """Signature-parity constructor (shared/pipeline.py:214-246)."""
    ds = TrainingPatchDataset(
        hr_files,
        patch_size=patch_size,
        patches_per_image=patches_per_image,
        scale=scale,
        batch_size=batch_size,
        seed=seed,
        shuffle_buffer=shuffle_buffer,
        output_dtype=output_dtype,
        cache_decoded=cache_decoded,
    )
    return ds, ds.total_patches


def make_eval_patch_dataset(
    hr_files: Sequence[str],
    patch_size: int,
    scale: float,
    batch_size: int,
    *,
    stride: Optional[int] = None,
) -> Tuple[GridPatchDataset, int, List[str]]:
    """Signature-parity constructor (shared/pipeline.py:249-288)."""
    ds = GridPatchDataset(hr_files, patch_size, scale, batch_size, stride)
    return ds, ds.total_patches, ds.patch_labels
