"""Depth-policy unit tests, including the experiment-2 design table."""

import pytest

from adunet.nn import (
    infer_depth_from_scale,
    custom_depth_from_scale,
    depth_and_sizes,
    estimate_bottleneck_size,
    encoder_sizes,
)


def test_design_table_policy():
    assert infer_depth_from_scale(0.2) == 1
    assert infer_depth_from_scale(0.25) == 1
    assert infer_depth_from_scale(0.3) == 2
    assert infer_depth_from_scale(0.45) == 2
    assert infer_depth_from_scale(0.5) == 3
    assert infer_depth_from_scale(0.9) == 3
    with pytest.raises(ValueError):
        infer_depth_from_scale(1.0)
    with pytest.raises(ValueError):
        infer_depth_from_scale(0.05)


def test_geometric_policy_values():
    # Hand-derived from the recurrence in shared/custom_layers.py:42-75.
    assert custom_depth_from_scale(0.2) == 2   # 256->52, then 11 < 21
    assert custom_depth_from_scale(0.3) == 3   # 256->77->24, then 8 < 21
    assert custom_depth_from_scale(0.5) == 4   # 256->128->64->32, then 16 < 21
    assert custom_depth_from_scale(0.9) == 7   # hits max_depth
    assert custom_depth_from_scale(0.5, max_depth=3) == 3
    # min_depth seeds the loop but the extent restarts at base_resolution,
    # so one more shrink still fits (reference recurrence semantics).
    assert custom_depth_from_scale(0.2, min_depth=4) == 5


def test_depth_and_sizes():
    depth, sizes = depth_and_sizes(0.5)
    assert sizes[0] == 256 and sizes[1] == 128
    assert depth == len(sizes)


def test_bottleneck_size():
    assert estimate_bottleneck_size(256, 0.5, 3) == 32
    assert estimate_bottleneck_size(256, 0.2, 5) >= 1


def test_encoder_sizes_match_resize_by_scale_sizing():
    sizes = encoder_sizes(256, 0.3, 3)
    assert sizes == [256, 77, 24, 8]  # ceil chain
    assert encoder_sizes(8, 0.1, 3)[-1] == 1  # floors at 1
