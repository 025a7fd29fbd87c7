"""Visual inspection grids for trained SR checkpoints.

Rebuild of /root/reference/Super_resolution/notebooks/model_eval_0_6.py:
for each selected validation image, render a 2x5 grid — top row full-frame
HR / degraded LR / prediction / |error| heatmap / Sobel-edge difference;
bottom row the same panels auto-zoomed around the maximum-error pixel —
plus per-image PSNR/SSIM in the panel titles.
"""

from __future__ import annotations

import argparse
from pathlib import Path
from typing import List, Optional

import numpy as np


def _sobel_mag(gray: np.ndarray) -> np.ndarray:
    kx = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], dtype=np.float32)
    ky = kx.T
    pad = np.pad(gray, 1, mode="edge")
    h, w = gray.shape
    gx = np.zeros_like(gray)
    gy = np.zeros_like(gray)
    for dy in range(3):
        for dx in range(3):
            window = pad[dy : dy + h, dx : dx + w]
            gx += kx[dy, dx] * window
            gy += ky[dy, dx] * window
    return np.sqrt(gx**2 + gy**2)


def crop_around(arr: np.ndarray, cy: int, cx: int, half: int) -> np.ndarray:
    h, w = arr.shape[:2]
    y0 = int(np.clip(cy - half, 0, max(h - 2 * half, 0)))
    x0 = int(np.clip(cx - half, 0, max(w - 2 * half, 0)))
    return arr[y0 : y0 + 2 * half, x0 : x0 + 2 * half]


def visualize_example(
    hr: np.ndarray,
    lr: np.ndarray,
    pred: np.ndarray,
    out_path: Path,
    zoom_half: int = 32,
    title: str = "",
) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    err = np.abs(hr - pred).mean(axis=-1)
    gray_hr = hr.mean(axis=-1)
    gray_pred = pred.mean(axis=-1)
    edge_diff = np.abs(_sobel_mag(gray_hr) - _sobel_mag(gray_pred))
    cy, cx = np.unravel_index(np.argmax(err), err.shape)

    panels = [
        ("HR", hr, None),
        ("LR (degraded)", lr, None),
        ("Prediction", pred, None),
        ("|error|", err, "magma"),
        ("edge diff", edge_diff, "viridis"),
    ]
    fig, axes = plt.subplots(2, 5, figsize=(18, 7.5))
    for col, (name, img, cmap) in enumerate(panels):
        axes[0, col].imshow(np.clip(img, 0, 1) if cmap is None else img, cmap=cmap)
        axes[0, col].set_title(name)
        zoom = crop_around(img, cy, cx, zoom_half)
        axes[1, col].imshow(np.clip(zoom, 0, 1) if cmap is None else zoom, cmap=cmap)
        axes[1, col].set_title(f"{name} (zoom @max-err)")
    for ax in axes.ravel():
        ax.axis("off")
    if title:
        fig.suptitle(title)
    fig.tight_layout()
    out_path.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_path, dpi=120)
    plt.close(fig)


def parse_args(argv: Optional[List[str]] = None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(description="Render SR inspection grids.")
    parser.add_argument("--model-path", type=Path, required=True,
                        help="Orbax checkpoint root (from train_sr).")
    parser.add_argument("--scale", type=float, required=True)
    parser.add_argument("--hr-dir", type=Path, required=True)
    parser.add_argument("--image-suffix", type=str, default=".png")
    parser.add_argument("--patch-size", type=int, default=256)
    parser.add_argument("--n-examples", type=int, default=4)
    parser.add_argument("--depth-override", type=int, default=None)
    parser.add_argument("--latest", action="store_true",
                        help="Inspect the most recent checkpoint instead of the "
                             "best-val one the evaluation pipeline reports on.")
    parser.add_argument("--output-dir", type=Path, default=Path("runs/inspection"))
    parser.add_argument("--seed", type=int, default=0)
    return parser.parse_args(argv)


def main(argv: Optional[List[str]] = None) -> None:
    from adunet.utils.runtime import setup_runtime

    setup_runtime()
    args = parse_args(argv)

    import jax.numpy as jnp

    from adunet.cli.evaluate import load_checkpoint_state
    from adunet.data import find_images, load_rgb_image_full, random_patches
    from adunet.metrics import psnr, ssim
    from adunet.ops import degrade

    files = find_images(args.hr_dir, args.image_suffix)
    rng = np.random.default_rng(args.seed)
    chosen = rng.choice(len(files), size=min(args.n_examples, len(files)), replace=False)

    state, _model, _info = load_checkpoint_state(
        args.model_path, args.scale, args.patch_size, args.depth_override,
        best=not args.latest,  # render the model the eval pipeline reports on
    )

    for idx in chosen:
        image = load_rgb_image_full(files[idx])
        if min(image.shape[:2]) < args.patch_size:
            continue
        hr = random_patches(image, args.patch_size, count=1, rng=rng)[0]
        lr = np.asarray(degrade(jnp.asarray(hr)[None], args.scale, args.patch_size)[0])
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        pred = np.asarray(state.apply_fn(variables, jnp.asarray(lr)[None])[0])
        pred = np.clip(pred, 0, 1)

        p = float(psnr(jnp.asarray(hr)[None], jnp.asarray(pred)[None])[0])
        s = float(ssim(jnp.asarray(hr)[None], jnp.asarray(pred)[None])[0])
        name = Path(files[idx]).stem
        out = args.output_dir / f"{name}_scale{args.scale:.2f}.png"
        visualize_example(
            hr, lr, pred, out,
            title=f"{name} — PSNR {p:.2f} dB, SSIM {s:.4f}",
        )
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
