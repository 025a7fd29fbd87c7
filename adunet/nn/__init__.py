"""Depth policies and shared Flax building blocks."""

from adunet.nn.depth_policy import (
    infer_depth_from_scale,
    custom_depth_from_scale,
    depth_and_sizes,
    estimate_bottleneck_size,
    encoder_sizes,
)

__all__ = [
    "infer_depth_from_scale",
    "custom_depth_from_scale",
    "depth_and_sizes",
    "estimate_bottleneck_size",
    "encoder_sizes",
]
