"""Pure-jnp image ops: fractional resize, degradation, luma, residual add."""

from adunet.ops.resize import (
    resize,
    resize_by_scale,
    resize_to_match,
    scaled_size,
    resize_matrix,
)
from adunet.ops.image import (
    degrade,
    rgb_to_luma_bt601,
    clipped_residual_add,
)

__all__ = [
    "resize",
    "resize_by_scale",
    "resize_to_match",
    "scaled_size",
    "resize_matrix",
    "degrade",
    "rgb_to_luma_bt601",
    "clipped_residual_add",
]
