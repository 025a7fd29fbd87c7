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

__all__ = ["sorted_alphanumeric", "split_indices"]


def sorted_alphanumeric(items: Iterable[str]) -> List[str]:
    """Sort strings so entries with embedded numbers follow numeric order."""

    def tokenize(token: str):
        return int(token) if token.isdigit() else token.lower()

    def split_key(text: str):
        token = ""
        tokens: List[str] = []
        for char in text:
            if char.isdigit():
                if token and not token[-1].isdigit():
                    tokens.append(token)
                    token = ""
                token += char
            else:
                if token and token[-1].isdigit():
                    tokens.append(token)
                    token = ""
                token += char
        if token:
            tokens.append(token)
        return [tokenize(part) for part in tokens]

    return sorted(items, key=split_key)


def split_indices(
    n_samples: int, train: float, val: float, test: float, seed: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Seeded shuffle → fractional train/val/test split with the reference's
    guards keeping at least one val and one test element when possible."""
    if not 0 < train < 1:
        raise ValueError("Train fraction should be between 0 and 1.")
    if not 0 <= val < 1 or not 0 <= test < 1:
        raise ValueError("Val/test fractions should be between 0 and 1.")
    total = train + val + test
    if total <= 0:
        raise ValueError("Fractions must sum to a positive value.")

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
        raise ValueError("Train split is empty; adjust fractions.")

    train_idx = indices[:train_count]
    val_idx = indices[train_count : train_count + val_count]
    test_idx = indices[train_count + val_count :]
    return train_idx, val_idx, test_idx
