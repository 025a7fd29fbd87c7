"""Segmentation losses: BCE, Dice, and the two protocol hybrids.

Exact semantics from /root/reference/Segmenation/code/train_adaptive_unet.py:258-304:
- dice_loss = 1 - soft Dice (clipped probs, smooth 1e-6)
- hybrid A: alpha*CE + beta*Dice (0.4/0.6 — MSCA-UNet protocol)
- hybrid B: w1*BCE + w2*Dice (0.5/1.0 — D2HU-Net protocol)

``binary_crossentropy`` matches Keras BinaryCrossentropy on probabilities:
clip to [1e-7, 1-1e-7], elementwise BCE, mean.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from adunet.metrics.seg import dice_coefficient

__all__ = [
    "binary_crossentropy",
    "dice_loss",
    "make_hybrid_ce_dice_loss",
    "make_bce_dice_loss",
]

_EPS = 1e-7


def binary_crossentropy(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    y_true = y_true.astype(jnp.float32)
    p = jnp.clip(y_pred.astype(jnp.float32), _EPS, 1.0 - _EPS)
    bce = -(y_true * jnp.log(p) + (1.0 - y_true) * jnp.log(1.0 - p))
    return jnp.mean(bce)


def dice_loss(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    return 1.0 - dice_coefficient(y_true, y_pred)


def make_hybrid_ce_dice_loss(alpha: float, beta: float) -> Callable[[jax.Array, jax.Array], jax.Array]:
    def loss_fn(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
        return alpha * binary_crossentropy(y_true, y_pred) + beta * dice_loss(y_true, y_pred)

    loss_fn.__name__ = "hybrid_ce_dice"
    return loss_fn


def make_bce_dice_loss(bce_weight: float, dice_weight: float) -> Callable[[jax.Array, jax.Array], jax.Array]:
    def loss_fn(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
        return bce_weight * binary_crossentropy(y_true, y_pred) + dice_weight * dice_loss(y_true, y_pred)

    loss_fn.__name__ = "bce_dice"
    return loss_fn
