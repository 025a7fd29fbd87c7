"""Super-resolution losses and training metrics.

Exact semantics from build_losses_and_metrics
(/root/reference/Super_resolution/code/train_adaptive_unet.py:294-373):

- charbonnier: mean(sqrt(diff^2 + eps^2)), eps=1e-3 (the default loss)
- l1: mean |diff|
- combined: 1.0*MSE + 0.1*(1 - mean SSIM) + 0.01*VGG19-block4_conv4 MSE
- psnr metric: batch-mean PSNR with predictions clipped to [0, 1]

All functions take/return f32 regardless of compute dtype, like the
reference's explicit casts.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from adunet.metrics.psnr_ssim import psnr, ssim

__all__ = [
    "charbonnier_loss",
    "l1_loss",
    "mse_loss",
    "ssim_loss",
    "psnr_metric",
    "build_losses_and_metrics",
]

LossFn = Callable[[jax.Array, jax.Array], jax.Array]


def charbonnier_loss(y_true: jax.Array, y_pred: jax.Array, epsilon: float = 1e-3) -> jax.Array:
    diff = y_true.astype(jnp.float32) - y_pred.astype(jnp.float32)
    return jnp.mean(jnp.sqrt(jnp.square(diff) + epsilon**2))


def l1_loss(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(y_true.astype(jnp.float32) - y_pred.astype(jnp.float32)))


def mse_loss(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    return jnp.mean(jnp.square(y_true.astype(jnp.float32) - y_pred.astype(jnp.float32)))


def ssim_loss(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    return 1.0 - jnp.mean(ssim(y_true.astype(jnp.float32), y_pred.astype(jnp.float32)))


def psnr_metric(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
    y_pred = jnp.clip(y_pred.astype(jnp.float32), 0.0, 1.0)
    return jnp.mean(psnr(y_true.astype(jnp.float32), y_pred))


def build_losses_and_metrics(
    loss_name: str,
    perceptual_fn: Callable[[jax.Array], jax.Array] | None = None,
    alpha: float = 1.0,
    beta: float = 0.1,
    gamma: float = 0.01,
) -> Tuple[LossFn, Dict[str, LossFn]]:
    """Return (loss_fn, metrics) for 'charbonnier' | 'l1' | 'combined'.

    For 'combined', pass ``perceptual_fn`` mapping clipped [0,1] RGB to VGG19
    block4_conv4 features (see adunet.losses.perceptual); the loss then adds
    gamma * MSE(features) exactly as the reference cocktail.
    """
    loss_key = loss_name.lower()
    metrics = {"psnr": psnr_metric}

    if loss_key == "charbonnier":
        return charbonnier_loss, metrics
    if loss_key == "l1":
        return l1_loss, metrics
    if loss_key == "combined":
        if perceptual_fn is None:
            raise ValueError(
                "combined loss requires a perceptual_fn (VGG19Features apply); "
                "see adunet.losses.perceptual."
            )

        def combined(y_true: jax.Array, y_pred: jax.Array) -> jax.Array:
            m = mse_loss(y_true, y_pred)
            s = ssim_loss(y_true, y_pred)
            ft = perceptual_fn(jnp.clip(y_true.astype(jnp.float32), 0.0, 1.0))
            fp = perceptual_fn(jnp.clip(y_pred.astype(jnp.float32), 0.0, 1.0))
            p = jnp.mean(jnp.square(ft - fp))
            return alpha * m + beta * s + gamma * p

        return combined, metrics

    raise ValueError(
        f"loss '{loss_name}' is not registered; choose charbonnier, l1, or combined."
    )
