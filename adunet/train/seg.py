"""Segmentation train/eval steps with on-device augmentation and BN stats.

Rebuild of the protocol trainer's hot loops
(/root/reference/Segmenation/code/train_adaptive_unet.py:538-546): one XLA
program per step covering augmentation (rot90/flips/scale-jitter-crop via
static-shape coordinate sampling), forward, hybrid loss, backward, Adam, and
the BatchNorm running-statistics update (Keras momentum semantics via the
flax mutable collection).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict

import jax

from adunet.data.augment import augment_pair_batch, flip_pair_batch
from adunet.metrics.seg import dice_coefficient, iou_score
from adunet.train.state import TrainState

__all__ = ["make_seg_train_step", "make_seg_eval_step"]


def make_seg_train_step(
    model,
    loss_fn: Callable[[jax.Array, jax.Array], jax.Array],
    augment: bool | str = True,
    donate: bool = True,
    extra_metrics: Dict[str, Callable] | None = None,
):
    """Returns jitted (state, (images, masks), rng) -> (state, metrics).

    ``augment``: True/'full' = rot90+flips+scale-jitter (protocol trainer);
    'flips' = LR/UD flips only (vanilla trainer); False/'none' = off.
    """
    mode = {True: "full", False: "none"}.get(augment, augment)

    def step(state: TrainState, batch, rng: jax.Array):
        images, masks = batch
        if mode == "full":
            images, masks = augment_pair_batch(images, masks, rng)
        elif mode == "flips":
            images, masks = flip_pair_batch(images, masks, rng)

        def compute_loss(params):
            variables = {"params": params}
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
                pred, new_vars = state.apply_fn(
                    variables, images, train=True, mutable=["batch_stats"]
                )
                new_stats = new_vars.get("batch_stats")
            else:
                pred = state.apply_fn(variables, images, train=True)
                new_stats = None
            loss = loss_fn(masks, pred)
            return loss, (pred, new_stats)

        (loss, (pred, new_stats)), grads = jax.value_and_grad(compute_loss, has_aux=True)(
            state.params
        )
        new_state = state.apply_gradients(grads=grads)
        if new_stats is not None:
            new_state = new_state.replace(batch_stats=new_stats)
        metrics = {
            "loss": loss,
            "dice": dice_coefficient(masks, pred),
            "iou": iou_score(masks, pred),
        }
        for name, fn in (extra_metrics or {}).items():
            metrics[name] = fn(masks, pred)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_seg_eval_step(
    model,
    loss_fn: Callable[[jax.Array, jax.Array], jax.Array],
    extra_metrics: Dict[str, Callable] | None = None,
):
    """Returns jitted (state, (images, masks)) -> batch metrics (no augment,
    BN running averages)."""

    @partial(jax.jit)
    def step(state: TrainState, batch) -> Dict[str, jax.Array]:
        images, masks = batch
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        pred = state.apply_fn(variables, images, train=False)
        metrics = {
            "loss": loss_fn(masks, pred),
            "dice": dice_coefficient(masks, pred),
            "iou": iou_score(masks, pred),
        }
        for name, fn in (extra_metrics or {}).items():
            metrics[name] = fn(masks, pred)
        return metrics

    return step
