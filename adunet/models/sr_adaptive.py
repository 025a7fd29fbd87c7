"""Adaptive-depth super-resolution U-Net — the flagship model.

TPU-native rebuild of build_super_resolution_unet
(/root/reference/Super_resolution/code/train_adaptive_unet.py:217-287):

- encoder depth from ``custom_depth_from_scale`` unless overridden;
- per level: ConvBlock(LayerNorm) → fractional ``resize_by_scale(scale)``
  shrink (instead of 2x max-pool), channels double;
- bottleneck ConvBlock;
- decoder: ``resize_to_match`` up → Conv3x3+ReLU (anti-artifact) → skip
  concat → ConvBlock;
- head: ConvBlock(64) → 1x1 conv to RGB with zero init → clipped residual
  add with the input (identity start).

Every spatial size in the trace is static (`encoder_sizes`), so each
(scale, depth, patch) config compiles once; the fractional resizes lower to
MXU matmuls (adunet.ops.resize). ``remat`` wraps each ConvBlock in
``jax.checkpoint`` — required for the depth-5 (138M-param) scale-0.7/0.8
models at useful batch sizes (SURVEY.md §7 hard part 3).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp
from flax import linen as nn

from adunet.nn.blocks import ConvBlock, conv3x3
from adunet.nn.depth_policy import custom_depth_from_scale, estimate_bottleneck_size
from adunet.ops import resize_by_scale, resize_to_match, clipped_residual_add

__all__ = ["AdaptiveSRUNet", "build_super_resolution_unet"]

_zeros = nn.initializers.zeros


class AdaptiveSRUNet(nn.Module):
    scale: float
    depth: int
    base_channels: int = 64
    residual_head_channels: int = 64
    dtype: Any = jnp.float32
    remat: bool = False
    # Selective rematerialisation (VERDICT r2 #4): checkpoint only the
    # SHALLOWEST ``remat_levels`` encoder/decoder blocks — the near-full-res
    # activations that dominate HBM in the deep scale-0.7/0.8 configs — and
    # keep the small deep-level activations stored, avoiding the ~30%
    # backward recompute the all-or-nothing ``remat=True`` pays on blocks
    # whose activations are cheap to hold. None = follow ``remat`` for all
    # blocks; 0 = no remat anywhere.
    remat_levels: int | None = None
    # Pallas tap-paired conv for the C=64 levels (adunet/kernels/conv64.py);
    # per-shape support gating + XLA fallback happen inside the op.
    pallas_conv: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        inputs = x
        remat_block = nn.remat(ConvBlock)

        def _use_remat(level: int | None) -> bool:
            if self.remat_levels is not None:
                # bottleneck/head (level None) stay stored under selective remat
                return level is not None and level < self.remat_levels
            return self.remat

        def block(nf, name, level=None):
            cls = remat_block if _use_remat(level) else ConvBlock
            return cls(
                nf, norm="layer", dtype=self.dtype, pallas_conv=self.pallas_conv, name=name
            )

        h = x.astype(self.dtype)
        skips = []
        nf = self.base_channels
        for level in range(self.depth):
            skip = block(nf, f"enc{level}", level)(h)
            h = resize_by_scale(skip, self.scale)  # fractional shrink, dtype-preserving
            skips.append(skip)
            nf *= 2

        h = block(nf, "bottleneck")(h)

        for level, skip in reversed(list(enumerate(skips))):
            nf //= 2
            h = resize_to_match(h, skip)
            # post-resize conv+ReLU cleans up resampling artifacts before fusion
            h = nn.relu(conv3x3(nf, self.dtype, name=f"dec{level}_smooth")(h))
            h = jnp.concatenate([h, skip], axis=-1)
            h = block(nf, f"dec{level}", level)(h)

        h = block(self.residual_head_channels, "head")(h)
        residual = nn.Conv(
            3,
            (1, 1),
            padding="SAME",
            kernel_init=_zeros,
            bias_init=_zeros,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="residual_rgb",
        )(h)
        # identity start: zero-init residual + clip keeps output == input at step 0
        return clipped_residual_add(inputs.astype(jnp.float32), residual.astype(jnp.float32))


def build_super_resolution_unet(
    scale: float,
    base_channels: int = 64,
    residual_head_channels: int = 64,
    depth_override: int | None = None,
    input_size: int = 256,
    max_depth: int = 7,
    dtype: Any = jnp.float32,
    remat: bool = False,
    remat_levels: int | None = None,
    pallas_conv: bool = False,
) -> Tuple[AdaptiveSRUNet, Dict[str, object]]:
    """Resolve depth and construct the module — mirrors the reference builder's
    signature and info payload (train_adaptive_unet.py:217-287)."""
    depth = (
        depth_override
        if depth_override is not None
        else custom_depth_from_scale(scale, max_depth=max_depth, base_resolution=input_size)
    )
    model = AdaptiveSRUNet(
        scale=scale,
        depth=depth,
        base_channels=base_channels,
        residual_head_channels=residual_head_channels,
        dtype=dtype,
        remat=remat,
        remat_levels=remat_levels,
        pallas_conv=pallas_conv,
    )
    info = {
        "scale": scale,
        "depth": depth,
        "bottleneck_size": estimate_bottleneck_size(input_size, scale, depth),
        "base_channels": base_channels,
        "max_depth": max_depth,
    }
    return model, info
