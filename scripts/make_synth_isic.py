"""Generate a synthetic ISIC-style lesion corpus (image + mask pairs).

ISIC-2017 is not present in this environment; seg-protocol experiments run
over synthetic skin-lesion lookalikes: a warm-toned "skin" background with
texture, plus one dark irregular lesion blob per image whose exact support
is the ground-truth mask. Filenames follow the ISIC convention
(`ISIC_0000123.jpg` + `ISIC_0000123_segmentation.png`) so the production
pair-discovery path (superpixels filtering, stem matching) is exercised
unmodified.

Usage:
    python scripts/make_synth_isic.py --out /tmp/isic --n-train 48 --n-val 12
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def lesion_mask(rng: np.random.Generator, size: int) -> np.ndarray:
    """Irregular blob: a circle whose radius is modulated by random
    low-order harmonics (lesions are not round)."""
    cy, cx = rng.uniform(0.3 * size, 0.7 * size, size=2)
    base_r = rng.uniform(0.10 * size, 0.25 * size)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    theta = np.arctan2(yy - cy, xx - cx)
    r = np.hypot(yy - cy, xx - cx)
    boundary = base_r * (
        1.0
        + 0.3 * rng.uniform(-1, 1) * np.sin(2 * theta + rng.uniform(0, np.pi))
        + 0.2 * rng.uniform(-1, 1) * np.sin(3 * theta + rng.uniform(0, np.pi))
        + 0.15 * rng.uniform(-1, 1) * np.sin(5 * theta + rng.uniform(0, np.pi))
    )
    return (r <= boundary).astype(np.float32)


def synth_pair(rng: np.random.Generator, size: int):
    # skin background: warm tone + smooth shading + fine texture
    base = np.array([rng.uniform(0.65, 0.85), rng.uniform(0.45, 0.6),
                     rng.uniform(0.35, 0.5)], np.float32)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    shade = 0.12 * np.sin(2 * np.pi * (rng.uniform(0.3, 1.0) * xx
                                       + rng.uniform(0.3, 1.0) * yy
                                       + rng.uniform(0, 1)))
    g = rng.integers(2, 5)
    tex = np.repeat(np.repeat(
        rng.random((size // g + 1, size // g + 1), dtype=np.float32), g, 0), g, 1
    )[:size, :size]
    image = base[None, None, :] + (shade + 0.05 * (tex - 0.5))[..., None]

    mask = lesion_mask(rng, size)
    lesion_color = np.array([rng.uniform(0.15, 0.4), rng.uniform(0.1, 0.3),
                             rng.uniform(0.1, 0.3)], np.float32)
    alpha = (mask * rng.uniform(0.65, 0.95))[..., None]
    image = (1 - alpha) * image + alpha * lesion_color[None, None, :]
    return np.clip(image, 0.0, 1.0).astype(np.float32), mask


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", type=Path, required=True)
    parser.add_argument("--n-train", type=int, default=48)
    parser.add_argument("--n-val", type=int, default=12)
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    import cv2

    rng = np.random.default_rng(args.seed)
    counter = 0
    for split, n in (("train", args.n_train), ("val", args.n_val)):
        img_dir = args.out / f"{split}_images"
        mask_dir = args.out / f"{split}_masks"
        img_dir.mkdir(parents=True, exist_ok=True)
        mask_dir.mkdir(parents=True, exist_ok=True)
        for _ in range(n):
            image, mask = synth_pair(rng, args.size)
            stem = f"ISIC_{counter:07d}"
            counter += 1
            cv2.imwrite(str(img_dir / f"{stem}.jpg"),
                        (image[..., ::-1] * 255).round().astype(np.uint8))
            cv2.imwrite(str(mask_dir / f"{stem}_segmentation.png"),
                        (mask * 255).astype(np.uint8))
    print(f"[isic-corpus] {args.n_train} train + {args.n_val} val pairs "
          f"({args.size}px) in {args.out}")


if __name__ == "__main__":
    main()
