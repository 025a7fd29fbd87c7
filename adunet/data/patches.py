"""Host-side patch extraction (numpy), matching shared/pipeline.py:97-174."""

from __future__ import annotations

from typing import List, Optional

import numpy as np

__all__ = ["random_patch", "random_patches", "grid_patches", "grid_patch_count"]


def grid_patch_count(
    height: int,
    width: int,
    patch_size: int,
    *,
    stride: Optional[int] = None,
    drop_remainder: bool = False,
) -> int:
    """Number of tiles ``grid_patches`` yields for an (height, width) image.

    Closed form of the tiling loop below, so callers can label/count patches
    from image headers alone without decoding pixels.
    """
    stride = stride or patch_size
    if patch_size <= 0 or stride <= 0:
        raise ValueError("patch_size and stride must be positive.")
    if height < patch_size or width < patch_size:
        raise ValueError("patch_size exceeds image dimensions.")
    # The reference's bottom-right fallback (shared/pipeline.py:170-172) is
    # unreachable given the size guard above: rows/cols are always >= 1, so
    # the closed form is the whole answer (drop_remainder never changes it).
    del drop_remainder
    rows = (height - patch_size) // stride + 1
    cols = (width - patch_size) // stride + 1
    return rows * cols


def random_patch(
    image: np.ndarray,
    patch_size: int,
    *,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    if patch_size <= 0:
        raise ValueError("patch_size must be positive.")
    if image.ndim != 3 or image.shape[-1] != 3:
        raise ValueError("image must be an HxWx3 RGB array.")
    height, width = image.shape[:2]
    if height < patch_size or width < patch_size:
        raise ValueError("patch_size exceeds image dimensions.")

    generator = rng or np.random.default_rng()
    max_y = height - patch_size
    max_x = width - patch_size
    top = int(generator.integers(0, max_y + 1)) if max_y > 0 else 0
    left = int(generator.integers(0, max_x + 1)) if max_x > 0 else 0
    return image[top : top + patch_size, left : left + patch_size, :]


def random_patches(
    image: np.ndarray,
    patch_size: int,
    count: int,
    *,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    if count <= 0:
        raise ValueError("count must be positive.")
    generator = rng or np.random.default_rng()
    return np.stack(
        [random_patch(image, patch_size, rng=generator) for _ in range(count)], axis=0
    )


def grid_patches(
    image: np.ndarray,
    patch_size: int,
    *,
    stride: Optional[int] = None,
    drop_remainder: bool = False,
) -> np.ndarray:
    """Regular tiling with the reference's bottom-right fallback patch."""
    if patch_size <= 0:
        raise ValueError("patch_size must be positive.")
    if image.ndim != 3 or image.shape[-1] != 3:
        raise ValueError("image must be an HxWx3 RGB array.")
    stride = stride or patch_size
    if stride <= 0:
        raise ValueError("stride must be positive.")

    height, width = image.shape[:2]
    if height < patch_size or width < patch_size:
        raise ValueError("patch_size exceeds image dimensions.")

    # NB: the loops always yield >= 1 patch under the size guard, so the
    # reference's bottom-right fallback / empty-grid cases
    # (shared/pipeline.py:170-174) cannot occur; drop_remainder is kept for
    # signature parity only.
    del drop_remainder
    patches: List[np.ndarray] = []
    for top in range(0, height - patch_size + 1, stride):
        for left in range(0, width - patch_size + 1, stride):
            patches.append(image[top : top + patch_size, left : left + patch_size, :])
    return np.stack(patches, axis=0)
