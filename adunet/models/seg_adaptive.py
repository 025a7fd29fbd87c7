"""Adaptive-depth segmentation U-Net (protocol trainer model).

Rebuild of build_adaptive_depth_unet
(/root/reference/Segmenation/code/train_adaptive_unet.py:325-362):
depth-parameterised classic U-Net — BatchNorm conv blocks, 2x2 max-pool
encoder, bilinear 2x upsample + skip-concat decoder (no smoothing conv),
1x1 sigmoid "lesion_mask" head.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from adunet.nn.blocks import ConvBlock, conv1x1
from adunet.ops import resize

__all__ = ["AdaptiveSegUNet", "build_adaptive_depth_unet"]


class AdaptiveSegUNet(nn.Module):
    depth: int = 4
    base_channels: int = 64
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
            h = resize(h, (h.shape[-3] * 2, h.shape[-2] * 2), "bilinear", antialias=False)
            h = h.astype(self.dtype)
            h = jnp.concatenate([h, skip], axis=-1)
            h = ConvBlock(nf, norm="batch", dtype=self.dtype, name=f"dec{level}")(h, train)

        out = conv1x1(1, self.dtype, name="lesion_mask")(h)
        return nn.sigmoid(out.astype(jnp.float32))


def build_adaptive_depth_unet(
    input_size: int,
    base_channels: int,
    depth: int,
    dtype: Any = jnp.float32,
) -> AdaptiveSegUNet:
    if input_size // (2**depth) < 1:
        raise ValueError(
            f"depth={depth} collapses a {input_size}px input to zero extent "
            f"(needs input_size >= 2^depth = {2**depth})."
        )
    return AdaptiveSegUNet(depth=depth, base_channels=base_channels, dtype=dtype)
