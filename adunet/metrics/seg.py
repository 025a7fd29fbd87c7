"""Segmentation metrics: Dice coefficient and IoU.

Exact semantics from /root/reference/Segmenation/code/train_adaptive_unet.py:258-280
(soft metrics on clipped probabilities, smooth=1e-6, batch-mean).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["dice_coefficient", "iou_score"]

_CLIP_LO = 1e-7
_CLIP_HI = 1.0 - 1e-7


@functools.partial(jax.jit, static_argnames=("smooth",))
def dice_coefficient(y_true: jax.Array, y_pred: jax.Array, smooth: float = 1e-6) -> jax.Array:
    """Soft Dice over (N, H, W, C), mean over batch."""
    y_true = y_true.astype(jnp.float32)
    y_pred = jnp.clip(y_pred.astype(jnp.float32), _CLIP_LO, _CLIP_HI)
    intersection = jnp.sum(y_true * y_pred, axis=(1, 2, 3))
    union = jnp.sum(y_true + y_pred, axis=(1, 2, 3))
    dice = (2.0 * intersection + smooth) / (union + smooth)
    return jnp.mean(dice)


@functools.partial(jax.jit, static_argnames=("smooth",))
def iou_score(y_true: jax.Array, y_pred: jax.Array, smooth: float = 1e-6) -> jax.Array:
    """Soft IoU over (N, H, W, C), mean over batch."""
    y_true = y_true.astype(jnp.float32)
    y_pred = jnp.clip(y_pred.astype(jnp.float32), _CLIP_LO, _CLIP_HI)
    intersection = jnp.sum(y_true * y_pred, axis=(1, 2, 3))
    total = jnp.sum(y_true + y_pred, axis=(1, 2, 3))
    union = total - intersection
    iou = (intersection + smooth) / (union + smooth)
    return jnp.mean(iou)
