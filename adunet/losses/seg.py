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
    "categorical_crossentropy",
    "make_weighted_ce_loss",
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


def categorical_crossentropy(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    """Keras CategoricalCrossentropy on probabilities: clip, -sum_c y*log(p),
    mean over pixels. Pairs with the softmax head the reference's vanilla
    builder switches to for num_classes > 1 (unet_vinillia.py:89-90)."""
    y_true = y_true.astype(jnp.float32)
    p = jnp.clip(y_pred.astype(jnp.float32), _EPS, 1.0 - _EPS)
    ce = -jnp.sum(y_true * jnp.log(p), axis=-1)
    return jnp.mean(ce)


def make_weighted_ce_loss(class_weights) -> Callable[[jax.Array, jax.Array], jax.Array]:
    """Class-weighted categorical CE for imbalanced multiclass masks.

    ``class_weights``: per-class weights (C,). Each pixel's CE term is scaled
    by the weight of its TRUE class; the mean is taken over all pixels (the
    standard per-pixel-weighted reduction, matching
    tf.losses.CategoricalCrossentropy with sample_weight=w[labels]).
    """
    w = jnp.asarray(class_weights, dtype=jnp.float32)

    def loss_fn(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
        y_true = y_true.astype(jnp.float32)
        p = jnp.clip(y_pred.astype(jnp.float32), _EPS, 1.0 - _EPS)
        ce = -jnp.sum(w * y_true * jnp.log(p), axis=-1)
        return jnp.mean(ce)

    loss_fn.__name__ = "weighted_categorical_crossentropy"
    return loss_fn


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
