"""Vanilla fixed-depth SR U-Net baseline.

Rebuild of /root/reference/Super_resolution/code/u-net-vinillia.py:128-168:
classic 4-level U-Net — BatchNorm conv blocks, 2x2 max-pool encoder
(64→128→256→512, bottleneck 1024), bilinear 2x upsample + Conv3x3(ReLU) +
skip-concat decoder, sigmoid RGB head.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from adunet.nn.blocks import ConvBlock, conv3x3, conv1x1
from adunet.ops import resize

__all__ = ["VanillaSRUNet"]


class VanillaSRUNet(nn.Module):
    base_channels: int = 64
    depth: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        h = x.astype(self.dtype)
        skips = []
        nf = self.base_channels
        for level in range(self.depth):
            skip = ConvBlock(nf, norm="batch", dtype=self.dtype, name=f"enc{level}")(h, train)
            h = nn.max_pool(skip, (2, 2), strides=(2, 2))
            skips.append(skip)
            nf *= 2

        h = ConvBlock(nf, norm="batch", dtype=self.dtype, name="bottleneck")(h, train)

        for level, skip in reversed(list(enumerate(skips))):
            nf //= 2
            # Keras UpSampling2D(interpolation="bilinear") == tf bilinear, no AA
            h = resize(h, (h.shape[-3] * 2, h.shape[-2] * 2), "bilinear", antialias=False)
            h = h.astype(self.dtype)
            h = nn.relu(conv3x3(nf, self.dtype, name=f"dec{level}_smooth")(h))
            h = jnp.concatenate([h, skip], axis=-1)
            h = ConvBlock(nf, norm="batch", dtype=self.dtype, name=f"dec{level}")(h, train)

        out = conv1x1(3, self.dtype, name="enhanced_rgb")(h)
        return nn.sigmoid(out.astype(jnp.float32))
