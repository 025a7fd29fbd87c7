"""Vanilla segmentation U-Net baseline.

Rebuild of build_unet (/root/reference/Segmenation/code/unet_vinillia.py:42-90):
LayerNorm conv blocks, max-pool encoder, Conv2DTranspose(2x2, stride 2)
decoder + skip concat, sigmoid head for 1 class / softmax for many.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from adunet.nn.blocks import ConvBlock, conv1x1

__all__ = ["VanillaSegUNet", "build_unet"]

_glorot = nn.initializers.glorot_uniform()


class VanillaSegUNet(nn.Module):
    num_classes: int = 1
    base_channels: int = 32
    depth: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        h = x.astype(self.dtype)
        skips = []
        nf = self.base_channels
        for level in range(self.depth):
            skip = ConvBlock(nf, norm="layer", dtype=self.dtype, name=f"enc{level}")(h)
            h = nn.max_pool(skip, (2, 2), strides=(2, 2))
            skips.append(skip)
            nf *= 2

        h = ConvBlock(nf, norm="layer", dtype=self.dtype, name="bottleneck")(h)

        for level, skip in reversed(list(enumerate(skips))):
            nf //= 2
            h = nn.ConvTranspose(
                nf,
                (2, 2),
                strides=(2, 2),
                padding="SAME",
                dtype=self.dtype,
                param_dtype=jnp.float32,
                kernel_init=_glorot,
                name=f"dec{level}_up",
            )(h)
            h = jnp.concatenate([h, skip], axis=-1)
            h = ConvBlock(nf, norm="layer", dtype=self.dtype, name=f"dec{level}")(h)

        out = conv1x1(self.num_classes, self.dtype, name="mask_logits")(h)
        out = out.astype(jnp.float32)
        if self.num_classes == 1:
            return nn.sigmoid(out)
        return nn.softmax(out, axis=-1)


def build_unet(
    input_size: int,
    num_classes: int = 1,
    base_channels: int = 32,
    depth: int = 4,
    dtype: Any = jnp.float32,
) -> VanillaSegUNet:
    del input_size
    return VanillaSegUNet(
        num_classes=num_classes, base_channels=base_channels, depth=depth, dtype=dtype
    )
