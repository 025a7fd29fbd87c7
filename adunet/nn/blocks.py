"""Shared Flax building blocks for the U-Net families.

The reference has three conv-block flavors (SURVEY.md §2.5):
- SR adaptive:   Conv3x3 → LayerNorm(channels) → ReLU, twice
                 (Super_resolution/code/train_adaptive_unet.py:200-210)
- Seg protocol:  Conv3x3 → BatchNorm → ReLU, twice
                 (Segmenation/code/train_adaptive_unet.py:325-332)
- Seg vanilla:   LayerNorm flavor again (Segmenation/code/unet_vinillia.py:42-52)

Norm hyperparameters match Keras defaults (LayerNormalization eps=1e-3;
BatchNormalization momentum=0.99, eps=1e-3). Convs use glorot-uniform init
(the Keras Conv2D default) so training dynamics are comparable.

Mixed precision follows the TPU recipe: params and norm statistics in
float32, conv compute in ``dtype`` (bfloat16 in production).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

__all__ = ["ConvBlock", "PallasConv3x3", "conv3x3", "conv1x1", "BN_MOMENTUM"]

# Keras BatchNormalization default. Single-sourced: precise-BN recovers
# per-batch statistics by inverting the EMA update new = m*old + (1-m)*b
# (adunet/train/seg.py), so the inversion and the layer MUST agree on m.
BN_MOMENTUM = 0.99

_glorot = nn.initializers.glorot_uniform()


class PallasConv3x3(nn.Module):
    """Drop-in 3x3 SAME conv with the tap-paired Pallas kernel fast path.

    Parameter tree (kernel/bias, same shapes/init as nn.Conv) is identical to
    the ``conv3x3`` it replaces, so checkpoints and the Keras-parity weight
    mapping are unaffected. Unsupported shapes fall back to the XLA conv
    inside ``conv3x3_same``.
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        kernel = self.param("kernel", _glorot, (3, 3, in_ch, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        from adunet.kernels.conv64 import conv3x3_same

        return conv3x3_same(
            x.astype(self.dtype), kernel.astype(self.dtype), bias.astype(self.dtype)
        )


def conv3x3(features: int, dtype: Any = jnp.float32, name: str | None = None, **kw) -> nn.Conv:
    return nn.Conv(
        features,
        (3, 3),
        padding="SAME",
        use_bias=True,
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=_glorot,
        name=name,
        **kw,
    )


def conv1x1(features: int, dtype: Any = jnp.float32, name: str | None = None, **kw) -> nn.Conv:
    return nn.Conv(
        features,
        (1, 1),
        padding="SAME",
        use_bias=True,
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=_glorot,
        name=name,
        **kw,
    )


class FusedLayerNormReLU(nn.Module):
    """Pallas LayerNorm+ReLU with nn.LayerNorm's exact parameter names
    ("scale"/"bias") so fused and unfused checkpoints are interchangeable."""

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from adunet.kernels import layer_norm_relu

        gamma = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return layer_norm_relu(x, gamma, beta, 1e-3)


class ConvBlock(nn.Module):
    """(Conv3x3 → Norm → ReLU) x2 at constant spatial size.

    With ``fused_norm=True`` the LayerNorm+ReLU pair runs as one Pallas
    kernel on TPU (bf16 in/out, f32 statistics in VMEM) — identical numerics
    AND an identical parameter tree (checkpoints are interchangeable)
    to the unfused path (adunet.kernels.fused_norm). Default is OFF: measured
    on a v5e, XLA's own fusion of the unfused chain is faster for this model
    (187 vs 210 ms/step at bs32/256px) because the custom VJP's
    rematerialisation costs more than the forward saves. Kept as validated
    infrastructure for models where the norm is the bottleneck.
    """

    features: int
    norm: str = "layer"  # "layer" | "batch" | "none"
    dtype: Any = jnp.float32
    fused_norm: bool = False
    # Pallas tap-paired implicit-GEMM conv for the C=64 levels (conv64.py);
    # unsupported shapes fall back to the XLA conv automatically.
    pallas_conv: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.norm not in ("layer", "batch", "none"):
            # silently skipping normalization on a typo ('Layer', 'batchnorm')
            # trains a different model with no error
            raise ValueError(f"unknown norm {self.norm!r} (expected layer|batch|none)")
        for i in range(2):
            if self.pallas_conv:
                x = PallasConv3x3(self.features, self.dtype, name=f"conv{i}")(x)
            else:
                x = conv3x3(self.features, self.dtype, name=f"conv{i}")(x)
            if self.norm == "layer":
                # Keras LayerNormalization(axis=-1): eps 1e-3, learnable scale+bias.
                if self.fused_norm:
                    # param tree matches nn.LayerNorm (norm{i}/{scale,bias})
                    # so checkpoints move freely between fused/unfused paths
                    x = FusedLayerNormReLU(self.features, name=f"norm{i}")(x)
                    continue
                x = nn.LayerNorm(epsilon=1e-3, dtype=jnp.float32, name=f"norm{i}")(x)
            elif self.norm == "batch":
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=BN_MOMENTUM,
                    epsilon=1e-3,
                    dtype=jnp.float32,
                    name=f"norm{i}",
                )(x)
            x = nn.relu(x).astype(self.dtype)
        return x
