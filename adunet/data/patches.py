"""Host-side patch sampling and tiling (numpy).

Capability match for the reference's crop utilities
(``shared/pipeline.py:97-174``), built TPU-first: tiling is a single
strided-view gather (no Python-per-patch loop) and the random sampler is
expressed around one seeded offset draw.

RNG contract (pinned, test-asserted): for each random crop the generator is
consulted for the vertical offset first, then the horizontal one, each via
``Generator.integers(0, span + 1)`` and each *only* when that axis actually
has slack (span > 0). This keeps seeded runs byte-identical to the
reference's patch streams, which is what makes split/golden parity possible.
Everything else here — structure, naming, the vectorised tiler — is original.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

__all__ = ["random_patch", "random_patches", "grid_patches", "grid_patch_count"]


def _check_crop_geometry(shape, size: int, stride: Optional[int] = None) -> None:
    """Validate an (H, W, 3) image against a square crop request."""
    if size <= 0:
        raise ValueError(f"crop size must be >= 1, got {size}")
    if stride is not None and stride <= 0:
        raise ValueError(f"tile stride must be >= 1, got {stride}")
    if len(shape) != 3 or shape[-1] != 3:
        raise ValueError(f"expected an RGB array of shape (H, W, 3), got {tuple(shape)}")
    if shape[0] < size or shape[1] < size:
        raise ValueError(
            f"crop size {size} does not fit inside a {shape[0]}x{shape[1]} image"
        )


def _draw_corner(rng: np.random.Generator, span_y: int, span_x: int) -> tuple:
    """One (top, left) draw; y before x, skipping zero-slack axes (pinned)."""
    top = int(rng.integers(0, span_y + 1)) if span_y > 0 else 0
    left = int(rng.integers(0, span_x + 1)) if span_x > 0 else 0
    return top, left


def random_patch(
    image: np.ndarray,
    patch_size: int,
    *,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """One uniformly-placed square crop of ``patch_size`` from an RGB image."""
    _check_crop_geometry(image.shape, patch_size)
    rng = rng if rng is not None else np.random.default_rng()
    top, left = _draw_corner(
        rng, image.shape[0] - patch_size, image.shape[1] - patch_size
    )
    return image[top : top + patch_size, left : left + patch_size, :]


def random_patches(
    image: np.ndarray,
    patch_size: int,
    count: int,
    *,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """``count`` independent random crops stacked along a new leading axis."""
    if count <= 0:
        raise ValueError(f"need at least one patch, got count={count}")
    _check_crop_geometry(image.shape, patch_size)
    rng = rng if rng is not None else np.random.default_rng()
    span_y = image.shape[0] - patch_size
    span_x = image.shape[1] - patch_size
    out = np.empty((count, patch_size, patch_size, image.shape[2]), dtype=image.dtype)
    for i in range(count):
        top, left = _draw_corner(rng, span_y, span_x)
        out[i] = image[top : top + patch_size, left : left + patch_size, :]
    return out


def grid_patch_count(
    height: int,
    width: int,
    patch_size: int,
    *,
    stride: Optional[int] = None,
    drop_remainder: bool = False,
) -> int:
    """Tile count of ``grid_patches`` for an (height, width) image.

    Closed form, so callers can label/count patches from image headers alone
    without decoding pixels. ``drop_remainder`` is accepted for signature
    parity with the reference but never changes the answer: under the fit
    guard the grid always contains the (0, 0) tile, so the reference's
    empty-grid bottom-right fallback (``shared/pipeline.py:170-174``) cannot
    trigger — asserted by brute force in ``tests/test_data_pipeline.py``.
    """
    step = stride or patch_size
    if patch_size <= 0:
        raise ValueError(f"crop size must be >= 1, got {patch_size}")
    if step <= 0:
        raise ValueError(f"tile stride must be >= 1, got {step}")
    if height < patch_size or width < patch_size:
        raise ValueError(
            f"crop size {patch_size} does not fit inside a {height}x{width} image"
        )
    del drop_remainder
    return ((height - patch_size) // step + 1) * ((width - patch_size) // step + 1)


def grid_patches(
    image: np.ndarray,
    patch_size: int,
    *,
    stride: Optional[int] = None,
    drop_remainder: bool = False,
) -> np.ndarray:
    """Regular strided tiling of an RGB image into square patches.

    Vectorised: one ``sliding_window_view`` + stride subsample + copy, rather
    than a Python loop per tile. Row-major (top-to-bottom, left-to-right)
    order, identical to the reference's nested loops. See
    :func:`grid_patch_count` for why ``drop_remainder`` is inert.
    """
    step = stride or patch_size
    _check_crop_geometry(image.shape, patch_size, stride=step)
    del drop_remainder
    windows = np.lib.stride_tricks.sliding_window_view(
        image, (patch_size, patch_size), axis=(0, 1)
    )[::step, ::step]
    rows, cols = windows.shape[:2]
    # windows: (rows, cols, C, ph, pw) -> (rows*cols, ph, pw, C), materialised.
    return np.ascontiguousarray(
        windows.transpose(0, 1, 3, 4, 2).reshape(
            rows * cols, patch_size, patch_size, image.shape[2]
        )
    )
