"""File discovery and image/mask pairing.

- ``find_images``          ← glob + natural sort (train_adaptive_unet.py:411-417)
- ``collect_isic_pairs``   ← Segmenation/code/train_adaptive_unet.py:71-135
  (superpixels filter, ``_segmentation`` mask suffix, hard error on missing)
- ``canonical_key`` / ``discover_pairs`` ← Segmenation/code/unet_vinillia.py:102-156
  (generic pairing supporting ISIC and Cityscapes-style suffixes)
"""

from __future__ import annotations

import glob as _glob
from pathlib import Path
from typing import Dict, List, Optional, Tuple

from adunet.utils import sorted_alphanumeric

__all__ = [
    "find_images",
    "pair_lr_files",
    "collect_isic_pairs",
    "normalise_isic_key",
    "canonical_key",
    "discover_pairs",
]


def pair_lr_files(hr_paths: List[str], low_res_dir: str | Path) -> List[str]:
    """Resolve each HR file's LR counterpart by identical filename.

    Supports the reference's real-LR-directory data path
    (train_adaptive_unet.py:123-197, the tf.cond branch that reads LR pixels
    from disk instead of synthesising them). Hard-errors listing the missing
    files, mirroring the ISIC pairing contract.
    """
    low_res_dir = Path(low_res_dir).expanduser()
    if not low_res_dir.is_dir():
        raise FileNotFoundError(f"Low-res directory not found: {low_res_dir}")
    lr_paths: List[str] = []
    missing: List[str] = []
    for hr in hr_paths:
        candidate = low_res_dir / Path(hr).name
        if candidate.is_file():
            lr_paths.append(str(candidate))
        else:
            missing.append(Path(hr).name)
    if missing:
        shown = ", ".join(missing[:5]) + ("…" if len(missing) > 5 else "")
        raise ValueError(
            f"Missing {len(missing)} LR counterparts in {low_res_dir}; examples: {shown}"
        )
    return lr_paths


def find_images(directory: str | Path, suffix: str = ".png", limit: Optional[int] = None) -> List[str]:
    directory = Path(directory).expanduser()
    if not directory.exists():
        raise FileNotFoundError(f"Image directory not found: {directory}")
    paths = sorted_alphanumeric(_glob.glob(str(directory / f"*{suffix}")))
    if limit is not None and limit > 0:
        paths = paths[:limit]
    if not paths:
        raise ValueError(f"found no *{suffix} images under {directory}")
    return paths


# ISIC-2017 ships JPEG photographs, PNG masks, and *_superpixels sidecars;
# .npy is this framework's extra decoded-array format (data/io.py).
_ISIC_IMAGE_EXTS = frozenset({".jpg", ".jpeg", ".png", ".npy"})
_ISIC_MASK_EXTS = frozenset({".png", ".jpg", ".npy"})
_MASK_TOKEN = "_segmentation"


def normalise_isic_key(path: Path) -> str:
    """Lower-case ISIC identifier without trailing segmentation tokens."""
    return path.stem.lower().replace(_MASK_TOKEN, "")


def _isic_inventory(directory: Path, role: str) -> List[Path]:
    """Single-pass listing of one ISIC directory.

    ``role="image"``: dermoscopic photographs — any supported file whose stem
    is not an ISIC superpixel sidecar. ``role="mask"``: ground truth — files
    whose stem carries the ``_segmentation`` token. Same accept/reject
    decisions as the reference pairing step
    (Segmenation/code/train_adaptive_unet.py:78-135); scan structure is our
    own (round-4 clean-room rewrite).
    """
    if not directory.exists():
        raise FileNotFoundError(f"ISIC {role} directory is absent: {directory}")
    allowed = _ISIC_IMAGE_EXTS if role == "image" else _ISIC_MASK_EXTS
    keep: List[Path] = []
    for entry in directory.iterdir():
        if not entry.is_file() or entry.suffix.lower() not in allowed:
            continue
        stem = entry.stem.lower()
        if role == "image" and "superpixels" in stem:
            continue
        if role == "mask" and not stem.endswith(_MASK_TOKEN):
            continue
        keep.append(entry)
    if not keep:
        raise FileNotFoundError(f"no usable ISIC {role} files under {directory}")
    return keep


def collect_isic_pairs(image_dir: str | Path, mask_dir: str | Path) -> List[Tuple[str, str]]:
    """Pair each dermoscopic image with its ``*_segmentation`` mask.

    Join semantics kept from the reference because tests assert them: output
    ordered by lower-cased image stem, masks looked up by
    :func:`normalise_isic_key`, superpixel sidecars never pair, and ANY
    unmatched image aborts with a ValueError naming up to five offenders
    (an incomplete corpus is a staging error, not something to train around).
    """
    images = sorted(_isic_inventory(Path(image_dir), "image"), key=lambda p: p.stem.lower())
    # Key collisions (same identifier, different extension) resolve to the
    # lexicographically-last mask name — deterministic, where the reference
    # left collision order to the filesystem.
    masks_by_key: Dict[str, Path] = {}
    for mask in sorted(_isic_inventory(Path(mask_dir), "mask"),
                       key=lambda p: (normalise_isic_key(p), p.name)):
        masks_by_key[normalise_isic_key(mask)] = mask

    keyed_images = [(normalise_isic_key(p), p) for p in images]
    unmatched = [p.name for key, p in keyed_images if key not in masks_by_key]
    if unmatched:
        shown = ", ".join(unmatched[:5])
        more = "" if len(unmatched) <= 5 else f", +{len(unmatched) - 5} more"
        raise ValueError(
            f"Missing {len(unmatched)} segmentation masks in {mask_dir} "
            f"(unmatched images: {shown}{more})"
        )
    return [(str(p), str(masks_by_key[key])) for key, p in keyed_images]


_CANONICAL_TOKENS = [
    "_segmentation",
    "_mask",
    "_leftimg8bit",
    "_gtfine_labelids",
    "_gtfine_polygons",
    "_gtfine_color",
    "_gtfine_instanceids",
    "_gtcoarse_labelids",
    "_gtcoarse_color",
    "_gtcoarse_instanceids",
    "_instanceids",
]


def canonical_key(path: Path) -> str:
    """Strip dataset-specific suffix tokens from a stem (ISIC + Cityscapes)."""
    stem = path.stem.lower()
    for token in _CANONICAL_TOKENS:
        stem = stem.replace(token, "")
    return stem


def discover_pairs(
    image_dir: str | Path,
    mask_dir: str | Path,
    image_suffix: str = ".jpg",
    mask_suffix: str = "_segmentation.png",
    limit: Optional[int] = None,
) -> List[Tuple[str, str]]:
    """Generic recursive image/mask pairing by canonical stem."""
    image_dir = Path(image_dir)
    mask_dir = Path(mask_dir)
    image_candidates = [str(p) for p in image_dir.rglob(f"*{image_suffix}") if p.is_file()]
    image_paths = [Path(p) for p in sorted_alphanumeric(image_candidates)]
    mask_lookup = {canonical_key(p): p for p in mask_dir.rglob(f"*{mask_suffix}") if p.is_file()}

    if not image_paths:
        raise ValueError(f"found no *{image_suffix} images under {image_dir}")
    if not mask_lookup:
        raise ValueError(f"found no *{mask_suffix} masks under {mask_dir}")

    pairs: List[Tuple[str, str]] = []
    for image_path in image_paths:
        key = canonical_key(image_path)
        mask_path = mask_lookup.get(key)
        if mask_path is None:
            raise ValueError(f"no mask pairs with image {image_path.name} (looked for key {key})")
        pairs.append((str(image_path), str(mask_path)))

    if limit is not None:
        pairs = pairs[:limit]
    return pairs
