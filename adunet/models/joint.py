"""Joint SR + segmentation U-Net with a shared encoder.

BASELINE config 5 ("Joint SR + segmentation shared-encoder run"). There is no
single reference file for this model — it composes the reference's two
workloads: the adaptive SR U-Net's fractional-resize encoder/decoder
(Super_resolution/code/train_adaptive_unet.py:217-287) and the segmentation
head convention (Segmenation/code/unet_vinillia.py:89-90, sigmoid for one
class / softmax for many). One encoder tower feeds two task decoders, so the
representation is trained by both the restoration and the mask losses; the
whole multi-task step stays a single XLA program and shards data-parallel
like the single-task models.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp
from flax import linen as nn

from adunet.nn.blocks import ConvBlock, conv1x1, conv3x3
from adunet.nn.depth_policy import custom_depth_from_scale, estimate_bottleneck_size
from adunet.ops import clipped_residual_add, resize_by_scale, resize_to_match

__all__ = ["JointSRSegUNet", "build_joint_unet"]

_zeros = nn.initializers.zeros


class JointSRSegUNet(nn.Module):
    scale: float
    depth: int
    base_channels: int = 64
    residual_head_channels: int = 64
    num_classes: int = 1
    dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        inputs = x
        block_cls = nn.remat(ConvBlock) if self.remat else ConvBlock

        # ---- shared encoder (fractional-resize downsampling) ----
        h = x.astype(self.dtype)
        skips = []
        nf = self.base_channels
        for level in range(self.depth):
            skip = block_cls(nf, norm="layer", dtype=self.dtype, name=f"enc{level}")(h)
            h = resize_by_scale(skip, self.scale)
            skips.append(skip)
            nf *= 2

        bottleneck = block_cls(nf, norm="layer", dtype=self.dtype, name="bottleneck")(h)

        def decoder(tag: str) -> jnp.ndarray:
            d = bottleneck
            dn = nf
            for level, skip in reversed(list(enumerate(skips))):
                dn //= 2
                d = resize_to_match(d, skip)
                d = nn.relu(conv3x3(dn, self.dtype, name=f"{tag}_dec{level}_smooth")(d))
                d = jnp.concatenate([d, skip], axis=-1)
                d = block_cls(dn, norm="layer", dtype=self.dtype, name=f"{tag}_dec{level}")(d)
            return d

        # ---- SR decoder: residual restoration head (identity start) ----
        sr = decoder("sr")
        sr = block_cls(self.residual_head_channels, norm="layer", dtype=self.dtype, name="sr_head")(sr)
        residual = nn.Conv(
            3, (1, 1), padding="SAME",
            kernel_init=_zeros, bias_init=_zeros,
            dtype=self.dtype, param_dtype=jnp.float32,
            name="residual_rgb",
        )(sr)
        sr_out = clipped_residual_add(inputs.astype(jnp.float32), residual.astype(jnp.float32))

        # ---- segmentation decoder: probability mask head ----
        seg = decoder("seg")
        logits = conv1x1(self.num_classes, self.dtype, name="mask_logits")(seg)
        logits = logits.astype(jnp.float32)
        seg_out = nn.sigmoid(logits) if self.num_classes == 1 else nn.softmax(logits, axis=-1)

        return sr_out, seg_out


def build_joint_unet(
    scale: float,
    base_channels: int = 64,
    residual_head_channels: int = 64,
    num_classes: int = 1,
    depth_override: int | None = None,
    input_size: int = 256,
    max_depth: int = 7,
    dtype: Any = jnp.float32,
    remat: bool = False,
) -> Tuple[JointSRSegUNet, Dict[str, object]]:
    """Resolve depth via the SR depth policy and construct the joint module."""
    depth = (
        depth_override
        if depth_override is not None
        else custom_depth_from_scale(scale, max_depth=max_depth, base_resolution=input_size)
    )
    model = JointSRSegUNet(
        scale=scale,
        depth=depth,
        base_channels=base_channels,
        residual_head_channels=residual_head_channels,
        num_classes=num_classes,
        dtype=dtype,
        remat=remat,
    )
    info = {
        "scale": scale,
        "depth": depth,
        "bottleneck_size": estimate_bottleneck_size(input_size, scale, depth),
        "base_channels": base_channels,
        "num_classes": num_classes,
    }
    return model, info
