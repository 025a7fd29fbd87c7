"""Data layer: discovery/pairing, host IO, patch pipelines, on-device augment."""

from adunet.data.io import (
    load_rgb_image,
    load_rgb_image_full,
    load_image_stack,
    load_mask,
    read_image_size,
)
from adunet.data.discovery import (
    find_images,
    pair_lr_files,
    collect_isic_pairs,
    normalise_isic_key,
    canonical_key,
    discover_pairs,
)
from adunet.data.patches import random_patch, random_patches, grid_patches, grid_patch_count
from adunet.data.sr_pipeline import (
    TrainingPatchDataset,
    GridPatchDataset,
    make_training_patch_dataset,
    make_eval_patch_dataset,
)
from adunet.data.seg_pipeline import SegPairDataset, build_isic_dataset
from adunet.data.augment import augment_pair_batch, random_resized_crop_pair, flip_pair_batch
from adunet.data.array_dataset import ArrayDataset, make_array_dataset
from adunet.data.device_cache import load_device_cache, sample_patch_batch

__all__ = [
    "load_rgb_image",
    "load_rgb_image_full",
    "load_image_stack",
    "load_mask",
    "read_image_size",
    "find_images",
    "pair_lr_files",
    "collect_isic_pairs",
    "normalise_isic_key",
    "canonical_key",
    "discover_pairs",
    "random_patch",
    "random_patches",
    "grid_patches",
    "grid_patch_count",
    "TrainingPatchDataset",
    "GridPatchDataset",
    "make_training_patch_dataset",
    "make_eval_patch_dataset",
    "SegPairDataset",
    "build_isic_dataset",
    "augment_pair_batch",
    "random_resized_crop_pair",
    "flip_pair_batch",
    "ArrayDataset",
    "make_array_dataset",
    "load_device_cache",
    "sample_patch_batch",
]
