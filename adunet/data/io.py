"""Host-side image IO.

Semantics follow /root/reference/shared/pipeline.py:38-76 (cv2 BGR→RGB,
INTER_AREA square resize, float32 [0,1]) with a PIL fallback when OpenCV is
unavailable, plus ``.npy`` support so tests and benchmarks can run without
image codecs.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional

import numpy as np

from adunet.utils import sorted_alphanumeric

try:  # pragma: no cover - environment probe
    import cv2  # type: ignore

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    cv2 = None
    _HAS_CV2 = False

try:  # pragma: no cover - environment probe
    from PIL import Image  # type: ignore

    _HAS_PIL = True
except Exception:  # pragma: no cover
    Image = None
    _HAS_PIL = False

__all__ = [
    "load_rgb_image",
    "load_rgb_image_full",
    "load_rgb_image_full_u8",
    "load_image_stack",
    "load_mask",
    "load_label_mask",
    "read_image_size",
]


def read_image_size(path: str | Path) -> tuple:
    """(height, width) of an image WITHOUT decoding its pixels.

    PIL parses only the header; ``.npy`` reads the array descriptor via mmap.
    Falls back to a full decode when no lazy reader applies. Lets grid-tiling
    datasets count patches per file without decoding every image twice (the
    reference's eval pipeline decodes twice, shared/pipeline.py:279-287 —
    deliberately fixed here).
    """
    path = Path(path)
    if path.suffix == ".npy":
        arr = np.load(str(path), mmap_mode="r")
        return (arr.shape[0], arr.shape[1])
    if _HAS_PIL:
        with Image.open(path) as im:
            width, height = im.size  # header-only; pixels stay undecoded
        return (height, width)
    return _read_rgb(path).shape[:2]


def _read_rgb(path: Path) -> np.ndarray:
    """Decode to RGB uint8/float array (H, W, 3)."""
    if path.suffix == ".npy":
        arr = np.load(str(path))
        if arr.ndim == 2:
            arr = np.stack([arr] * 3, axis=-1)
        return arr
    if _HAS_CV2:
        img = cv2.imread(str(path), cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(f"image failed to decode: {path}")
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    if _HAS_PIL:
        with Image.open(path) as im:
            return np.asarray(im.convert("RGB"))
    raise RuntimeError("No image decoder available (need cv2 or PIL).")


def _to_float01(arr: np.ndarray) -> np.ndarray:
    if arr.dtype == np.uint8:
        return arr.astype(np.float32) / 255.0
    if arr.dtype == np.uint16:
        return arr.astype(np.float32) / 65535.0
    return arr.astype(np.float32)


def load_rgb_image_full(path: str | Path) -> np.ndarray:
    """RGB float32 [0,1], native size (shared/pipeline.py:70-76)."""
    return _to_float01(_read_rgb(Path(path)))


def load_rgb_image_full_u8(path: str | Path) -> np.ndarray:
    """RGB uint8, native size — the wire-efficient host-feed format.

    Image files are uint8 at the source; keeping them uint8 through the
    patch pipeline quarters host->device transfer volume (the train step
    normalises to [0,1] f32 on device). Float sources (.npy tests) are
    quantised to uint8.
    """
    arr = _read_rgb(Path(path))
    if arr.dtype == np.uint8:
        return arr
    if arr.dtype == np.uint16:
        return (arr // 257).astype(np.uint8)
    return np.clip(np.round(arr.astype(np.float32) * 255.0), 0, 255).astype(np.uint8)


def load_rgb_image(path: str | Path, size: int, interp: str = "area") -> np.ndarray:
    """RGB float32 [0,1], square resize.

    ``interp="area"`` is the shared loader's INTER_AREA
    (shared/pipeline.py:60-67); ``interp="linear"`` matches the vanilla seg
    trainer's tf BILINEAR resize (unet_vinillia.py:166)."""
    img = _read_rgb(Path(path))
    cv2_interp = {"area": "INTER_AREA", "linear": "INTER_LINEAR"}
    if interp not in cv2_interp:
        raise ValueError(f"unknown interp {interp!r} (expected area|linear)")
    if _HAS_CV2:
        img = cv2.resize(img, (size, size), interpolation=getattr(cv2, cv2_interp[interp]))
        return _to_float01(img)
    # fallback: exact kernel weights from the resize-as-matmul machinery
    img = _to_float01(img)
    from adunet.ops.resize import resize_matrix

    method = "area" if interp == "area" else "bilinear"
    wh = resize_matrix(img.shape[0], size, method)
    ww = resize_matrix(img.shape[1], size, method)
    return np.einsum("ih,hwc->iwc", wh, np.einsum("jw,hwc->hjc", ww, img)).astype(np.float32)


def load_image_stack(directory: str | Path, size: int, limit: Optional[int] = None) -> np.ndarray:
    """Directory of images → (N, size, size, 3) float32 stack
    (shared/pipeline.py:38-57)."""
    directory = Path(directory)
    names = sorted_alphanumeric([p.name for p in directory.iterdir() if p.is_file()])
    if limit is not None:
        names = names[:limit]
    images: List[np.ndarray] = [load_rgb_image(directory / n, size) for n in names]
    if not images:
        raise ValueError(f"found no images under {directory}")
    return np.stack(images, axis=0)


def _read_gray(path: Path) -> np.ndarray:
    """Decode a mask file to a 2-D integer/float array, no resize."""
    path = Path(path)
    if path.suffix == ".npy":
        arr = np.load(str(path))
    elif _HAS_CV2:
        arr = cv2.imread(str(path), cv2.IMREAD_GRAYSCALE)
        if arr is None:
            raise FileNotFoundError(f"mask failed to decode: {path}")
    elif _HAS_PIL:
        with Image.open(path) as im:
            arr = np.asarray(im.convert("L"))
    else:
        raise RuntimeError("No image decoder available (need cv2 or PIL).")
    if arr.ndim == 3:
        arr = arr[..., 0]
    return arr


def _nearest_resize(arr: np.ndarray, size: int) -> np.ndarray:
    if arr.shape[:2] == (size, size):
        return arr
    if _HAS_CV2 and arr.dtype != np.int64:
        return cv2.resize(arr, (size, size), interpolation=cv2.INTER_NEAREST)
    ys = (np.arange(size) * arr.shape[0] // size).clip(0, arr.shape[0] - 1)
    xs = (np.arange(size) * arr.shape[1] // size).clip(0, arr.shape[1] - 1)
    return arr[np.ix_(ys, xs)]


def load_label_mask(path: str | Path, size: int, num_classes: int) -> np.ndarray:
    """Multiclass mask → one-hot float32 (size, size, num_classes).

    The file stores integer class ids (Cityscapes-style labelIds); resize is
    NEAREST so ids never interpolate. Ids >= num_classes clamp into the last
    class (treated as ignore/void by convention). Supports BASELINE config 4
    (softmax head, unet_vinillia.py:89-90).
    """
    arr = _read_gray(Path(path))
    arr = _nearest_resize(arr, size)
    labels = np.clip(arr.astype(np.int64), 0, num_classes - 1)
    return np.eye(num_classes, dtype=np.float32)[labels]


def load_mask(path: str | Path, size: int, threshold: float = 0.5) -> np.ndarray:
    """Binary mask float32 (size, size, 1): nearest resize, 0.5-binarise
    (Segmenation/code/train_adaptive_unet.py:147-154)."""
    arr = _nearest_resize(_read_gray(Path(path)), size)
    mask = _to_float01(arr)
    mask = (mask > threshold).astype(np.float32)
    return mask[..., None]
