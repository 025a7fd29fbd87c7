"""Joint SR+seg multi-task train/eval steps — one fused XLA program.

Drives adunet.models.joint.JointSRSegUNet (BASELINE config 5): on-device LR
degradation, shared-encoder forward producing (sr, mask), weighted multi-task
loss, backward, Adam. Batch = (images, masks); the SR target is the clean
input image itself (SR-as-restoration, shared/pipeline.py:79-94 convention).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict

import jax
import jax.numpy as jnp

from adunet.metrics.psnr_ssim import psnr
from adunet.metrics.seg import dice_coefficient, iou_score
from adunet.ops import degrade
from adunet.train.sr import _as_f01
from adunet.train.state import TrainState

__all__ = ["make_joint_train_step", "make_joint_eval_step"]


def _joint_loss_and_metrics(
    sr_loss_fn: Callable,
    seg_loss_fn: Callable,
    sr_weight: float,
    seg_weight: float,
    hr: jax.Array,
    masks: jax.Array,
    sr_pred: jax.Array,
    seg_pred: jax.Array,
):
    sr_l = sr_loss_fn(hr, sr_pred)
    seg_l = seg_loss_fn(masks, seg_pred)
    loss = sr_weight * sr_l + seg_weight * seg_l
    clipped = jnp.clip(sr_pred.astype(jnp.float32), 0.0, 1.0)
    metrics = {
        "sr_loss": sr_l,
        "seg_loss": seg_l,
        "psnr": jnp.mean(psnr(hr.astype(jnp.float32), clipped)),
        "dice": dice_coefficient(masks, seg_pred),
        "iou": iou_score(masks, seg_pred),
    }
    return loss, metrics


def make_joint_train_step(
    model,
    sr_loss_fn: Callable,
    seg_loss_fn: Callable,
    sr_weight: float = 1.0,
    seg_weight: float = 1.0,
    data_scale: float = 0.5,
    donate: bool = True,
):
    """Returns jitted (state, (images, masks), rng) -> (state, metrics)."""

    def step(state: TrainState, batch, rng: jax.Array | None = None):
        del rng
        images, masks = batch
        images = _as_f01(images)  # uint8 wire format -> [0,1] f32, as in SR
        lr_batch = degrade(images, data_scale)

        def compute_loss(params):
            sr_pred, seg_pred = state.apply_fn({"params": params}, lr_batch)
            return _joint_loss_and_metrics(
                sr_loss_fn, seg_loss_fn, sr_weight, seg_weight,
                images, masks, sr_pred, seg_pred,
            )

        (loss, metrics), grads = jax.value_and_grad(compute_loss, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads=grads)
        return new_state, {"loss": loss, **metrics}

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_joint_eval_step(
    model,
    sr_loss_fn: Callable,
    seg_loss_fn: Callable,
    sr_weight: float = 1.0,
    seg_weight: float = 1.0,
    data_scale: float = 0.5,
    per_sample: bool = False,
):
    """Returns jitted (state, (images, masks)) -> batch metrics.

    ``per_sample=True`` returns ``(B,)`` vectors (singleton-batch vmap over
    the whole loss/metric tail) for mesh-sharded masked validation."""

    @partial(jax.jit)
    def step(state: TrainState, batch) -> Dict[str, jax.Array]:
        images, masks = batch
        images = _as_f01(images)
        lr_batch = degrade(images, data_scale)
        sr_pred, seg_pred = state.apply_fn({"params": state.params}, lr_batch)

        def tail(hr_i, mask_i, sr_i, seg_i):
            loss, metrics = _joint_loss_and_metrics(
                sr_loss_fn, seg_loss_fn, sr_weight, seg_weight,
                hr_i, mask_i, sr_i, seg_i,
            )
            return {"loss": loss, **metrics}

        if per_sample:
            return jax.vmap(
                lambda h, m, s, g: tail(h[None], m[None], s[None], g[None])
            )(images, masks, sr_pred, seg_pred)
        return tail(images, masks, sr_pred, seg_pred)

    return step
