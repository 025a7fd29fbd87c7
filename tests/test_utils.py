"""Natural sort and split semantics (shared/pipeline.py:11-35,291-317)."""

import numpy as np
import pytest

from adunet.utils import sorted_alphanumeric, split_indices


def test_sorted_alphanumeric_numeric_order():
    items = ["img10.png", "img2.png", "img1.png", "IMG3.png"]
    assert sorted_alphanumeric(items) == ["img1.png", "img2.png", "IMG3.png", "img10.png"]


def test_split_indices_deterministic_and_disjoint():
    tr, va, te = split_indices(100, 0.8, 0.1, 0.1, seed=1234)
    tr2, va2, te2 = split_indices(100, 0.8, 0.1, 0.1, seed=1234)
    np.testing.assert_array_equal(tr, tr2)
    all_idx = np.concatenate([tr, va, te])
    assert len(set(all_idx.tolist())) == 100
    assert len(va) >= 1 and len(te) >= 1


def test_split_indices_guards():
    with pytest.raises(ValueError):
        split_indices(10, 0.0, 0.5, 0.5, seed=0)
    with pytest.raises(ValueError):
        split_indices(10, 0.8, -0.1, 0.1, seed=0)


def test_process_shard_single_process_identity():
    from adunet.parallel.distributed import process_seed, process_shard

    seq = list(range(7))
    assert process_shard(seq) == seq  # single process: unchanged
    assert process_seed(42) == 42
