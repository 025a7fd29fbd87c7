"""On-device ISIC augmentations — jit-compatible, static shapes.

Rebuild of apply_isic_augmentations
(/root/reference/Segmenation/code/train_adaptive_unet.py:157-190):
random rot90, LR/UD flips, 1.0–1.15x scale jitter + aligned random crop,
mask re-binarised at 0.5.

TPU-first design: the reference's "resize to round(u*size) then random-crop
back" produces *dynamic shapes*, which XLA cannot compile. The identical
pixel math is expressed here as direct coordinate sampling: crop pixel i of
the resized image equals a bilinear sample of the original at
``(o + i + 0.5) * size/scaled - 0.5`` — so we gather at those coordinates with
static output shape. Bilinear for images, nearest (floor) for masks, exactly
as tf.image.resize would have produced them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "random_resized_crop_pair",
    "augment_pair",
    "augment_pair_batch",
    "flip_pair_batch",
]


def _linear_gather(x: jax.Array, coords: jax.Array, axis: int) -> jax.Array:
    """Sample along ``axis`` at fractional positions (clamped bilinear taps)."""
    n = x.shape[axis]
    i0 = jnp.floor(coords)
    frac = (coords - i0).astype(jnp.float32)
    i0 = i0.astype(jnp.int32)
    a = jnp.take(x, jnp.clip(i0, 0, n - 1), axis=axis)
    b = jnp.take(x, jnp.clip(i0 + 1, 0, n - 1), axis=axis)
    shape = [1] * x.ndim
    shape[axis] = coords.shape[0]
    w = frac.reshape(shape)
    return a * (1.0 - w) + b * w


def _nearest_gather(x: jax.Array, coords: jax.Array, axis: int) -> jax.Array:
    n = x.shape[axis]
    idx = jnp.clip(jnp.floor(coords).astype(jnp.int32), 0, n - 1)
    return jnp.take(x, idx, axis=axis)


def random_resized_crop_pair(
    image: jax.Array,
    mask: jax.Array,
    key: jax.Array,
    min_scale: float = 1.0,
    max_scale: float = 1.15,
):
    """Scale-jitter + aligned random crop for an (S,S,C) image/mask pair."""
    size = image.shape[0]
    k_scale, k_oy, k_ox = jax.random.split(key, 3)
    u = jax.random.uniform(k_scale, (), minval=min_scale, maxval=max_scale)
    scaled = jnp.round(u * size).astype(jnp.int32)
    max_off = scaled - size
    oy = jax.random.randint(k_oy, (), 0, max_off + 1).astype(jnp.float32)
    ox = jax.random.randint(k_ox, (), 0, max_off + 1).astype(jnp.float32)

    ratio = size / scaled.astype(jnp.float32)
    idx = jnp.arange(size, dtype=jnp.float32)
    ys = (oy + idx + 0.5) * ratio - 0.5
    xs = (ox + idx + 0.5) * ratio - 0.5

    img = _linear_gather(_linear_gather(image.astype(jnp.float32), ys, 0), xs, 1)
    # masks: tf resizes NEAREST — src = floor((dst+0.5)*ratio)
    ys_n = (oy + idx + 0.5) * ratio
    xs_n = (ox + idx + 0.5) * ratio
    msk = _nearest_gather(_nearest_gather(mask.astype(jnp.float32), ys_n, 0), xs_n, 1)
    msk = jnp.where(msk > 0.5, 1.0, 0.0)
    return img, msk


def augment_pair(
    image: jax.Array,
    mask: jax.Array,
    key: jax.Array,
    min_scale: float = 1.0,
    max_scale: float = 1.15,
):
    """rot90^k → random flips → scale-jitter crop, for one (S,S,C)/(S,S,1) pair."""
    k_rot, k_lr, k_ud, k_crop = jax.random.split(key, 4)
    k = jax.random.randint(k_rot, (), 0, 4)

    def rot(pair, times):
        return tuple(jnp.rot90(t, times, axes=(0, 1)) for t in pair)

    image, mask = jax.lax.switch(
        k,
        [lambda p: rot(p, 0), lambda p: rot(p, 1), lambda p: rot(p, 2), lambda p: rot(p, 3)],
        (image, mask),
    )
    flip_lr = jax.random.uniform(k_lr, ()) > 0.5
    flip_ud = jax.random.uniform(k_ud, ()) > 0.5
    image = jnp.where(flip_lr, image[:, ::-1], image)
    mask = jnp.where(flip_lr, mask[:, ::-1], mask)
    image = jnp.where(flip_ud, image[::-1], image)
    mask = jnp.where(flip_ud, mask[::-1], mask)
    return random_resized_crop_pair(image, mask, k_crop, min_scale, max_scale)


def augment_pair_batch(
    images: jax.Array,
    masks: jax.Array,
    key: jax.Array,
    min_scale: float = 1.0,
    max_scale: float = 1.15,
):
    """Vectorised per-sample augmentation over (N,S,S,C)/(N,S,S,1) batches."""
    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(lambda i, m, k: augment_pair(i, m, k, min_scale, max_scale))(
        images, masks, keys
    )


def flip_pair_batch(images: jax.Array, masks: jax.Array, key: jax.Array):
    """Flips-only augmentation (vanilla seg trainer,
    Segmenation/code/unet_vinillia.py:178-185): independent LR/UD coin flips
    per sample, applied identically to image and mask."""

    def one(image, mask, k):
        k_lr, k_ud = jax.random.split(k)
        flip_lr = jax.random.uniform(k_lr, ()) > 0.5
        flip_ud = jax.random.uniform(k_ud, ()) > 0.5
        image = jnp.where(flip_lr, image[:, ::-1], image)
        mask = jnp.where(flip_lr, mask[:, ::-1], mask)
        image = jnp.where(flip_ud, image[::-1], image)
        mask = jnp.where(flip_ud, mask[::-1], mask)
        return image, mask

    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(one)(images, masks, keys)
