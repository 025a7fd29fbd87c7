"""Host-side utilities: natural sort, seeded splits."""

from adunet.utils.misc import sorted_alphanumeric, split_indices

__all__ = ["sorted_alphanumeric", "split_indices"]
