"""Generate a structured synthetic image corpus for on-chip experiments.

DIV2K/ISIC are not present in this environment, so sweep-scale experiments
(experiments/round2_sweep) run over a synthetic corpus with natural-image-like
statistics: smooth color fields (low-frequency Gaussian mixtures), hard
geometric edges (rectangles/discs), and fine texture — enough structure that
super-resolution training has real signal (PSNR climbs) and grid-tiled
evaluation produces meaningful tables, unlike uniform noise.

Usage:
    python scripts/make_synth_corpus.py --out /tmp/corpus --n 48 --size 512
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def synth_image(rng: np.random.Generator, size: int) -> np.ndarray:
    """One HR image in [0,1] float32, (size, size, 3)."""
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size

    # low-frequency color field: sum of random 2-D cosine waves per channel
    img = np.zeros((size, size, 3), np.float32)
    for c in range(3):
        acc = np.zeros((size, size), np.float32)
        for _ in range(4):
            fx, fy = rng.uniform(0.5, 4.0, size=2)
            phase = rng.uniform(0, 2 * np.pi)
            amp = rng.uniform(0.1, 0.4)
            acc += amp * np.cos(2 * np.pi * (fx * xx + fy * yy) + phase)
        img[..., c] = acc
    img = (img - img.min()) / max(float(img.max() - img.min()), 1e-6)

    # hard-edged shapes (discs + axis-aligned rectangles) with flat colors
    for _ in range(rng.integers(6, 14)):
        color = rng.random(3).astype(np.float32)
        if rng.random() < 0.5:
            cy, cx = rng.uniform(0, size, size=2)
            r = rng.uniform(size * 0.02, size * 0.15)
            mask = (yy * size - cy) ** 2 + (xx * size - cx) ** 2 < r * r
        else:
            y0, x0 = rng.integers(0, size, size=2)
            h, w = rng.integers(size // 32, size // 4, size=2)
            mask = np.zeros((size, size), bool)
            mask[y0 : y0 + h, x0 : x0 + w] = True
        alpha = rng.uniform(0.5, 1.0)
        img[mask] = (1 - alpha) * img[mask] + alpha * color

    # fine texture: band-limited noise (upsampled coarse noise minus mean)
    g = rng.integers(3, 6)  # texture grain in px
    coarse = rng.random((size // g + 1, size // g + 1, 3), dtype=np.float32)
    tex = np.repeat(np.repeat(coarse, g, 0), g, 1)[:size, :size]
    img = np.clip(img + rng.uniform(0.03, 0.10) * (tex - 0.5), 0.0, 1.0)
    return img.astype(np.float32)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", type=Path, required=True)
    parser.add_argument("--n", type=int, default=48)
    parser.add_argument("--size", type=int, default=512)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--format", choices=["png", "npy"], default="png")
    args = parser.parse_args()

    args.out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    for i in range(args.n):
        img = synth_image(rng, args.size)
        if args.format == "png":
            import cv2

            cv2.imwrite(str(args.out / f"synth{i:04d}.png"),
                        (img[..., ::-1] * 255).round().astype(np.uint8))
        else:
            np.save(args.out / f"synth{i:04d}.npy", img)
    print(f"[corpus] {args.n} x {args.size}px {args.format} images in {args.out}")


if __name__ == "__main__":
    main()
