"""Device-resident dataset: cache the corpus in HBM, sample crops on device.

The strongest host-feed optimisation available when the dataset fits HBM:
DIV2K-train is ~5 GB as uint8 (800 images), a v5e chip has 16 GB — so the
whole corpus can live on device and the jitted train step samples random
patches itself (image index + crop offsets from the step rng, gathered with
dynamic slices). Per-step host->device traffic drops to ZERO; the host only
supplies PRNG keys.

Constraint: one stacked (N, H, W, 3) uint8 array needs uniform image sizes —
stage with a common crop/resize (scripts/stage_dataset.sh) or fall back to
the threaded patch pipeline for mixed sizes.

Reference counterpart: none — the reference streams cv2 decodes per patch
(shared/pipeline.py:177-246, its HOT LOOP #1). This module replaces that
loop with device memory.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from adunet.data.io import load_rgb_image_full_u8

__all__ = ["load_device_cache", "sample_patch_batch"]


def load_device_cache(paths: Sequence[str], sharding=None) -> jax.Array:
    """Decode a uniform-size corpus into one (N, H, W, 3) uint8 device array.

    ``sharding``: optional placement (e.g. replicated over a mesh). Raises
    on mixed image sizes — use the streaming patch pipeline for those.
    """
    images = [load_rgb_image_full_u8(p) for p in paths]
    shapes = {im.shape for im in images}
    if len(shapes) != 1:
        raise ValueError(
            f"Device cache needs uniform image sizes, got {sorted(shapes)}; "
            "stage a uniform corpus or use the streaming patch pipeline."
        )
    stack = np.stack(images)
    if sharding is not None:
        return jax.device_put(stack, sharding)
    return jax.device_put(stack)


def sample_patch_batch(
    images_u8: jax.Array,
    rng: jax.Array,
    batch_size: int,
    patch_size: int,
) -> jax.Array:
    """Jit-safe random patch batch from the device cache -> f32 [0,1].

    Uniform image choice + uniform crop offsets (the reference's
    random_patch semantics, shared/pipeline.py:97-120), all on device.
    """
    n, h, w, _ = images_u8.shape
    k_idx, k_y, k_x = jax.random.split(rng, 3)
    idx = jax.random.randint(k_idx, (batch_size,), 0, n)
    ys = jax.random.randint(k_y, (batch_size,), 0, h - patch_size + 1)
    xs = jax.random.randint(k_x, (batch_size,), 0, w - patch_size + 1)

    def crop(i, y, x):
        img = jax.lax.dynamic_index_in_dim(images_u8, i, 0, keepdims=False)
        return jax.lax.dynamic_slice(img, (y, x, 0), (patch_size, patch_size, 3))

    batch = jax.vmap(crop)(idx, ys, xs)
    return batch.astype(jnp.float32) * (1.0 / 255.0)
