"""Image-space ops: synthetic LR degradation, BT.601 luma, clipped residual.

Exact semantics taken from the reference:
- ``degrade``            ← shared/pipeline.py:79-94 (cv2 INTER_AREA down,
                            INTER_CUBIC(a=-0.75) up; no final clip)
- ``rgb_to_luma_bt601``  ← Super_resolution/code/train_adaptive_unet.py:144-157
- ``clipped_residual_add`` ← shared/custom_layers.py:134-139
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from adunet.ops.resize import resize

__all__ = ["degrade", "rgb_to_luma_bt601", "clipped_residual_add"]


def degrade(hr: jax.Array, scale: float, output_size: int | None = None) -> jax.Array:
    """Synthesise an LR counterpart by shrinking and re-upscaling an HR image.

    Bit-comparable with the reference's cv2 path
    (shared/pipeline.py:79-94): clip input to [0,1], box-filter (INTER_AREA)
    downsample to ``round(size*scale)``, Keys-cubic a=-0.75 (INTER_CUBIC)
    upsample back. The output is NOT clipped (cubic overshoot is preserved,
    as in the reference). LR and HR share pixel dims — SR-as-restoration.

    Works on (..., H, W, C); under jit the two resizes are MXU matmuls.
    """
    if not 0 < scale < 1:
        raise ValueError("degrade scale: expected a value strictly inside (0, 1).")
    h, w = hr.shape[-3], hr.shape[-2]
    if output_size is not None and output_size > 0:
        target_h = target_w = int(output_size)
    else:
        # preserve each dimension — forcing a square here would return a
        # max(h,w)-square LR for non-square inputs and break the
        # "LR and HR share pixel dims" contract above
        target_h, target_w = h, w
    down_h = max(1, int(round(target_h * scale)))
    down_w = max(1, int(round(target_w * scale)))

    x = jnp.clip(hr.astype(jnp.float32), 0.0, 1.0)
    down = resize(x, (down_h, down_w), method="area")
    up = resize(down, (target_h, target_w), method="bicubic_cv2", antialias=False)
    return up


def rgb_to_luma_bt601(image: jax.Array) -> jax.Array:
    """RGB in [0,1] → BT.601 luminance in [0,1].

    Coefficients 65.481/128.553/24.966 with +16 offset, /255, clipped — the
    channel every reference quality metric is computed on
    (Super_resolution/code/train_adaptive_unet.py:144-157).
    """
    image = image.astype(jnp.float32)
    coeffs = jnp.asarray([65.481, 128.553, 24.966], dtype=jnp.float32)
    y = jnp.sum(image * coeffs, axis=-1, keepdims=True) + 16.0
    return jnp.clip(y / 255.0, 0.0, 1.0)


def clipped_residual_add(inp: jax.Array, residual: jax.Array) -> jax.Array:
    """clip(input + residual, 0, 1), cast back to input dtype
    (shared/custom_layers.py:134-139)."""
    out = inp.astype(jnp.float32) + residual.astype(jnp.float32)
    return jnp.clip(out, 0.0, 1.0).astype(inp.dtype)
