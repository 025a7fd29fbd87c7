"""Pallas TPU kernels for the hot fused ops (XLA fallback always available)."""

from adunet.kernels.fused_norm import layer_norm_relu, layer_norm_relu_reference

__all__ = ["layer_norm_relu", "layer_norm_relu_reference"]
