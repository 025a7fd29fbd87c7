"""Segmentation metrics: Dice coefficient and IoU.

Exact semantics from /root/reference/Segmenation/code/train_adaptive_unet.py:258-280
(soft metrics on clipped probabilities, smooth=1e-6, batch-mean).
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "dice_coefficient",
    "iou_score",
    "mean_iou",
    "global_dice_coefficient",
    "binary_accuracy",
    "precision",
    "recall",
    "PooledMetric",
    "pooled_global_dice",
    "pooled_precision",
    "pooled_recall",
    "pooled_mean_iou",
]

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


@functools.partial(jax.jit, static_argnames=("num_classes",))
def mean_iou(y_true: jax.Array, y_pred: jax.Array, num_classes: int) -> jax.Array:
    """Hard mIoU over one-hot labels / class-probability predictions.

    Labels and predictions are argmaxed to hard class maps; per-class IoU is
    intersection/union over the whole batch; classes absent from both label
    and prediction (union == 0) are excluded from the mean. This is the
    multiclass eval metric for the softmax-head configuration
    (unet_vinillia.py:89-90; BASELINE config 4).
    """
    t = jnp.argmax(y_true, axis=-1)
    p = jnp.argmax(y_pred, axis=-1)
    # confusion counts via one-hot sums — static shapes, no scatter
    t1 = jax.nn.one_hot(t, num_classes, dtype=jnp.float32)
    p1 = jax.nn.one_hot(p, num_classes, dtype=jnp.float32)
    axes = tuple(range(t1.ndim - 1))
    intersection = jnp.sum(t1 * p1, axis=axes)
    union = jnp.sum(t1, axis=axes) + jnp.sum(p1, axis=axes) - intersection
    present = union > 0
    iou = jnp.where(present, intersection / jnp.maximum(union, 1.0), 0.0)
    return jnp.sum(iou) / jnp.maximum(jnp.sum(present.astype(jnp.float32)), 1.0)


@functools.partial(jax.jit, static_argnames=("smooth",))
def global_dice_coefficient(y_true: jax.Array, y_pred: jax.Array, smooth: float = 1e-6) -> jax.Array:
    """Whole-batch Dice (sums over every element) — the vanilla seg trainer's
    variant (Segmenation/code/unet_vinillia.py:93-98), distinct from the
    per-sample protocol metric above."""
    y_true = y_true.astype(jnp.float32)
    y_pred = y_pred.astype(jnp.float32)
    numerator = 2.0 * jnp.sum(y_true * y_pred) + smooth
    denominator = jnp.sum(y_true + y_pred) + smooth
    return numerator / denominator


@functools.partial(jax.jit, static_argnames=("threshold",))
def binary_accuracy(y_true: jax.Array, y_pred: jax.Array, threshold: float = 0.5) -> jax.Array:
    pred = (y_pred.astype(jnp.float32) > threshold).astype(jnp.float32)
    return jnp.mean((pred == y_true.astype(jnp.float32)).astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("threshold",))
def precision(y_true: jax.Array, y_pred: jax.Array, threshold: float = 0.5) -> jax.Array:
    y_true = y_true.astype(jnp.float32)
    pred = (y_pred.astype(jnp.float32) > threshold).astype(jnp.float32)
    tp = jnp.sum(pred * y_true)
    fp = jnp.sum(pred * (1.0 - y_true))
    return tp / jnp.maximum(tp + fp, 1e-12)


@functools.partial(jax.jit, static_argnames=("threshold",))
def recall(y_true: jax.Array, y_pred: jax.Array, threshold: float = 0.5) -> jax.Array:
    y_true = y_true.astype(jnp.float32)
    pred = (y_pred.astype(jnp.float32) > threshold).astype(jnp.float32)
    tp = jnp.sum(pred * y_true)
    fn = jnp.sum((1.0 - pred) * y_true)
    return tp / jnp.maximum(tp + fn, 1e-12)


class PooledMetric(NamedTuple):
    """A metric POOLED over the evaluation set, not averaged per sample.

    Mean-of-per-sample lifting (``lift_per_sample``) is only exact for
    metrics defined as a batch mean of per-sample values (Dice/IoU in the
    protocol trainer). Pooled metrics — whole-batch Dice, precision/recall
    (ratios of pixel counts), hard mIoU (per-class intersection/union) —
    change meaning under that lift. This wrapper carries the three forms a
    pooled metric needs:

    - ``batch_fn(y_true, y_pred) -> scalar``: the plain batch-pooled value
      (train-step running metrics; the replicated non-sharded val path,
      which keeps the reference's Keras per-batch-mean convention).
    - ``stats(y_true, y_pred) -> {name: () or (K,) array}``: component SUMS
      over the batch (e.g. tp / predicted-positives). Sums are linear, so
      fit()'s sharded val path can lift them per sample, mask padded rows,
      and accumulate across shards and batches without changing the math.
    - ``finalize({name: np.ndarray}) -> float``: epoch value from the summed
      components, applied once on host.

    Pooling over the WHOLE val set matches Keras's stateful metrics
    (Precision/Recall/MeanIoU accumulate over the epoch) exactly — for those
    this is more faithful than the per-batch weighted mean.
    """

    batch_fn: Callable[[jax.Array, jax.Array], jax.Array]
    stats: Callable[[jax.Array, jax.Array], Dict[str, jax.Array]]
    finalize: Callable[[Dict[str, np.ndarray]], float]


def pooled_global_dice(smooth: float = 1e-6) -> PooledMetric:
    """Whole-set Dice: (2·Σtp + smooth) / (Σ(t+p) + smooth) over every pixel
    of every evaluated image (unet_vinillia.py:93-98 pooled across the set)."""

    def stats(y_true, y_pred):
        t = y_true.astype(jnp.float32)
        p = y_pred.astype(jnp.float32)
        return {"num": 2.0 * jnp.sum(t * p), "den": jnp.sum(t + p)}

    def finalize(c):
        return float((c["num"] + smooth) / (c["den"] + smooth))

    return PooledMetric(global_dice_coefficient, stats, finalize)


def pooled_precision(threshold: float = 0.5) -> PooledMetric:
    """Whole-set precision — matches Keras's stateful Precision metric
    (tp / predicted-positives accumulated over the epoch)."""

    def stats(y_true, y_pred):
        t = y_true.astype(jnp.float32)
        pred = (y_pred.astype(jnp.float32) > threshold).astype(jnp.float32)
        return {"tp": jnp.sum(pred * t), "pp": jnp.sum(pred)}

    def finalize(c):
        return float(c["tp"] / max(float(c["pp"]), 1e-12))

    return PooledMetric(precision, stats, finalize)


def pooled_recall(threshold: float = 0.5) -> PooledMetric:
    """Whole-set recall — matches Keras's stateful Recall metric."""

    def stats(y_true, y_pred):
        t = y_true.astype(jnp.float32)
        pred = (y_pred.astype(jnp.float32) > threshold).astype(jnp.float32)
        return {"tp": jnp.sum(pred * t), "ap": jnp.sum(t)}

    def finalize(c):
        return float(c["tp"] / max(float(c["ap"]), 1e-12))

    return PooledMetric(recall, stats, finalize)


def pooled_mean_iou(num_classes: int) -> PooledMetric:
    """Whole-set hard mIoU — matches Keras's stateful MeanIoU (one confusion
    matrix over the epoch), excluding classes absent from the whole set."""

    def stats(y_true, y_pred):
        t1 = jax.nn.one_hot(jnp.argmax(y_true, axis=-1), num_classes, dtype=jnp.float32)
        p1 = jax.nn.one_hot(jnp.argmax(y_pred, axis=-1), num_classes, dtype=jnp.float32)
        axes = tuple(range(t1.ndim - 1))
        inter = jnp.sum(t1 * p1, axis=axes)
        union = jnp.sum(t1, axis=axes) + jnp.sum(p1, axis=axes) - inter
        return {"inter": inter, "union": union}  # each (num_classes,)

    def finalize(c):
        inter, union = np.asarray(c["inter"]), np.asarray(c["union"])
        present = union > 0
        iou = np.where(present, inter / np.maximum(union, 1.0), 0.0)
        return float(iou.sum() / max(present.sum(), 1))

    return PooledMetric(
        functools.partial(mean_iou, num_classes=num_classes), stats, finalize
    )
