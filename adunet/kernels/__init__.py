"""Pallas TPU kernels for the hot fused ops (XLA fallback always available)."""

from adunet.kernels.fused_norm import layer_norm_relu, layer_norm_relu_reference
from adunet.kernels.conv64 import conv3x3_same, conv3x3_same_pallas

__all__ = [
    "layer_norm_relu",
    "layer_norm_relu_reference",
    "conv3x3_same",
    "conv3x3_same_pallas",
]
