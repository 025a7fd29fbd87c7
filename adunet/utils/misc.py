"""Natural-order sorting and seeded dataset splits.

One canonical implementation for helpers the reference duplicates in three
places (shared/pipeline.py:11-35,291-317; the SR trainer and vanilla script
re-inline both — SURVEY.md §2.5). ``split_indices`` reproduces the reference
RNG stream exactly (np.random.default_rng(seed).shuffle over arange) so file
splits match for a given seed.
"""

from __future__ import annotations

from typing import Iterable, List, Tuple

import numpy as np

__all__ = ["sorted_alphanumeric", "split_indices", "pad_leading_to"]


def pad_leading_to(arr: np.ndarray, n: int) -> np.ndarray:
    """Pad the leading dim to ``n`` rows by repeating the last row.

    The one shape-stable ragged-tail padding used by the sharded evaluator,
    ``pad_and_shard_ragged`` and the tiled restorer — consumers mask or
    slice the duplicate rows away, so the fill values never reach results.
    """
    arr = np.asarray(arr)
    if arr.shape[0] >= n:
        return arr
    fill = np.repeat(arr[-1:], n - arr.shape[0], axis=0)
    return np.concatenate([arr, fill], axis=0)


def sorted_alphanumeric(items: Iterable[str]) -> List[str]:
    """Sort strings so entries with embedded numbers follow numeric order.

    Keys alternate (str, int, str, ...) with a guaranteed leading string —
    a digit-leading name gets an empty first token — so every comparison is
    str-vs-str or int-vs-int. A naive tokenizer whose first token type
    depends on the first character raises TypeError the moment one name
    starts with a digit and another with a letter ('0801.png' vs
    'thumbnail.png'), aborting dataset discovery.
    """
    import re

    def split_key(text: str):
        parts = re.split(r"(\d+)", text)  # even idx: non-digit (may be ''), odd: digits
        return [int(p) if i % 2 else p.lower() for i, p in enumerate(parts)]

    return sorted(items, key=split_key)


def split_indices(
    n_samples: int, train: float, val: float, test: float, seed: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Seeded shuffle → fractional train/val/test split with the reference's
    guards keeping at least one val and one test element when possible."""
    if not 0 < train < 1:
        raise ValueError("train fraction: expected a value inside [0, 1].")
    if not 0 <= val < 1 or not 0 <= test < 1:
        raise ValueError("val/test fractions: expected values inside [0, 1].")
    total = train + val + test
    if total <= 0:
        raise ValueError("split fractions sum to zero: nothing to split.")

    rng = np.random.default_rng(seed)
    indices = np.arange(n_samples)
    rng.shuffle(indices)

    train_count = int(round(n_samples * train / total))
    val_count = int(round(n_samples * val / total))
    train_count = min(train_count, n_samples - 2) if n_samples > 2 else train_count
    val_count = (
        min(val_count, n_samples - train_count - 1)
        if n_samples > (train_count + 1)
        else val_count
    )

    if train_count <= 0:
        raise ValueError("no indices left for the train split after val/test allocation.")

    train_idx = indices[:train_count]
    val_idx = indices[train_count : train_count + val_count]
    test_idx = indices[train_count + val_count :]
    return train_idx, val_idx, test_idx
