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
from typing import List, Optional, Tuple

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


def normalise_isic_key(path: Path) -> str:
    """Lower-case ISIC identifier without trailing segmentation tokens."""
    return path.stem.lower().replace("_segmentation", "")


def collect_isic_pairs(image_dir: str | Path, mask_dir: str | Path) -> List[Tuple[str, str]]:
    """Align dermoscopic images with their segmentation masks; hard-errors on
    missing masks with the reference's truncated-example message shape."""
    image_dir = Path(image_dir)
    mask_dir = Path(mask_dir)
    if not image_dir.exists():
        raise FileNotFoundError(f"image directory missing on disk: {image_dir}")
    if not mask_dir.exists():
        raise FileNotFoundError(f"mask directory missing on disk: {mask_dir}")

    def valid_image(path: Path) -> bool:
        return (
            path.is_file()
            and path.suffix.lower() in {".jpg", ".jpeg", ".png", ".npy"}
            and "superpixels" not in path.stem.lower()
        )

    def valid_mask(path: Path) -> bool:
        return (
            path.is_file()
            and path.suffix.lower() in {".png", ".jpg", ".npy"}
            and path.stem.lower().endswith("_segmentation")
        )

    image_paths = sorted([p for p in image_dir.iterdir() if valid_image(p)], key=lambda p: p.stem.lower())
    mask_paths = sorted([p for p in mask_dir.iterdir() if valid_mask(p)], key=normalise_isic_key)

    if not image_paths:
        raise FileNotFoundError(f"found no image files under {image_dir}")
    if not mask_paths:
        raise FileNotFoundError(f"found no mask files under {mask_dir}")

    mask_index = {normalise_isic_key(p): p for p in mask_paths}
    missing: List[str] = []
    pairs: List[Tuple[str, str]] = []
    for image_path in image_paths:
        mask_path = mask_index.get(normalise_isic_key(image_path))
        if mask_path is None:
            missing.append(image_path.name)
            continue
        pairs.append((str(image_path), str(mask_path)))

    if missing:
        truncated = ", ".join(missing[:5])
        suffix = "" if len(missing) <= 5 else "…"
        raise ValueError(
            f"Missing {len(missing)} segmentation masks in {mask_dir}; "
            f"e.g. {truncated}{suffix}"
        )
    return pairs


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
