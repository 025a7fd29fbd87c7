"""Apply a trained SR model to a directory of images (batch restoration).

The reference ships training/eval/visual-inspection scripts but no way to
actually RUN a model over new images; this CLI completes the workflow. Images
of arbitrary size are grid-tiled with overlap, restored tile-by-tile through
one jitted forward program (static tile shape -> single compile), and
stitched back with linear overlap blending to hide seams. Degraded inputs are
either taken as-is (--assume_lr, restoration of real LR images) or
synthesised from clean sources at --scale for demonstration.
"""

from __future__ import annotations

import argparse
from pathlib import Path
from typing import List, Optional

import numpy as np


def parse_args(argv: Optional[List[str]] = None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(description="Restore a directory of images with a trained SR model.")
    parser.add_argument("--model-path", type=Path, default=None,
                        help="Orbax checkpoint root (directory written by train_sr).")
    parser.add_argument("--from-export", type=Path, default=None,
                        help="Serve from a StableHLO artifact (cli/export_model.py) "
                             "instead of a checkpoint; no model rebuild involved.")
    parser.add_argument("--scale", type=float, default=None,
                        help="Degradation scale; required unless --assume-lr "
                             "skips the synthetic degrade (checkpoint loads also "
                             "need it to rebuild the architecture).")
    parser.add_argument("--input-dir", type=Path, required=True)
    parser.add_argument("--output-dir", type=Path, required=True)
    parser.add_argument("--image-suffix", type=str, default=".png")
    parser.add_argument("--patch-size", type=int, default=256)
    parser.add_argument("--overlap", type=int, default=32,
                        help="Tile overlap in px; overlapping predictions blend linearly.")
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--limit", type=int, default=None)
    parser.add_argument("--depth-override", type=int, default=None)
    parser.add_argument("--latest", action="store_true",
                        help="Load the most recent checkpoint instead of the best-val one.")
    parser.add_argument("--assume-lr", action="store_true",
                        help="Treat inputs as already-degraded LR images (no synthetic "
                             "degradation before the forward pass).")
    args = parser.parse_args(argv)

    # Flag-consistency validation (ADVICE r2): conflicting sources must error,
    # and --scale is only demanded where something actually consumes it.
    if args.from_export is not None and args.model_path is not None:
        parser.error("--model-path and --from-export are mutually exclusive; "
                     "pick one weight source.")
    if args.from_export is not None and args.depth_override is not None:
        parser.error("--depth-override has no effect on an exported artifact "
                     "(the depth is baked into the StableHLO program).")
    if args.from_export is not None and args.latest:
        parser.error("--latest has no effect on an exported artifact; "
                     "re-export from the desired checkpoint instead.")
    needs_scale = (
        not args.assume_lr            # synthetic degrade runs at --scale
        or args.from_export is None   # checkpoint rebuild needs the scale
    )
    if needs_scale and args.scale is None:
        parser.error("--scale is required (it drives the synthetic degrade "
                     "and/or the checkpoint architecture rebuild).")
    return args


def _tile_starts(extent: int, patch: int, overlap: int) -> List[int]:
    """Start offsets covering [0, extent) with `overlap` px shared between
    neighbours; the last tile is right-aligned."""
    if extent <= patch:
        return [0]
    stride = max(patch - overlap, 1)
    starts = list(range(0, extent - patch, stride))
    starts.append(extent - patch)
    return starts


def _blend_weights(patch: int, overlap: int) -> np.ndarray:
    """2-D weight window ramping linearly inside the overlap margins.

    The taper is clamped to half the patch so the ascending and descending
    ramps never overlap (an overlap > patch/2 would otherwise overwrite the
    ascending edge and bias the blend toward the left/top tile)."""
    ramp = np.ones(patch, np.float32)
    taper = min(max(overlap, 1), patch // 2)
    edge = np.linspace(1.0 / (taper + 1), 1.0, taper, dtype=np.float32)
    ramp[:taper] = edge
    ramp[-taper:] = edge[::-1]
    return ramp[:, None] * ramp[None, :]


def restore_image(image: np.ndarray, forward, patch: int, overlap: int,
                  batch_size: int) -> np.ndarray:
    """Tile -> predict -> stitch with linear overlap blending."""
    import jax.numpy as jnp

    from adunet.utils.misc import pad_leading_to

    h, w = image.shape[:2]
    pad_h, pad_w = max(0, patch - h), max(0, patch - w)
    if pad_h or pad_w:
        image = np.pad(image, ((0, pad_h), (0, pad_w), (0, 0)), mode="reflect")
    ph, pw = image.shape[:2]

    coords = [(y, x) for y in _tile_starts(ph, patch, overlap)
              for x in _tile_starts(pw, patch, overlap)]
    weights = _blend_weights(patch, overlap)

    out = np.zeros((ph, pw, 3), np.float32)
    norm = np.zeros((ph, pw, 1), np.float32)
    for i in range(0, len(coords), batch_size):
        chunk = coords[i : i + batch_size]
        tiles = np.stack([image[y : y + patch, x : x + patch] for y, x in chunk])
        tiles = pad_leading_to(tiles, batch_size)  # pad to the compiled shape
        preds = np.asarray(forward(jnp.asarray(tiles)))[: len(chunk)]
        for (y, x), pred in zip(chunk, preds):
            out[y : y + patch, x : x + patch] += pred * weights[..., None]
            norm[y : y + patch, x : x + patch] += weights[..., None]
    out = out / np.maximum(norm, 1e-8)
    return np.clip(out[:h, :w], 0.0, 1.0)


def main(argv: Optional[List[str]] = None) -> None:
    from adunet.utils.runtime import setup_runtime

    setup_runtime()
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp

    from adunet.cli.evaluate import load_checkpoint_state
    from adunet.data import find_images, load_rgb_image_full
    from adunet.ops import degrade

    files = find_images(args.input_dir, args.image_suffix, args.limit)

    if args.from_export is not None:
        from adunet.export import load_artifact

        call, manifest = load_artifact(args.from_export)
        in_shape = manifest.get("input_shape")
        if in_shape:  # the artifact's static shapes win over the CLI defaults
            args.batch_size, args.patch_size = int(in_shape[0]), int(in_shape[1])
        print(f"Restoring {len(files)} images from exported artifact "
              f"{args.from_export} (depth {manifest.get('depth', '?')}, "
              f"tiles {args.patch_size}px, overlap {args.overlap}px).")

        if args.assume_lr:
            forward = call
        else:
            degrade_fn = jax.jit(lambda t: degrade(t, args.scale, args.patch_size))

            def forward(tiles):
                return call(degrade_fn(tiles))
    else:
        if args.model_path is None:
            raise SystemExit("one of --model-path / --from-export is required")
        state, model, info = load_checkpoint_state(
            args.model_path, args.scale, args.patch_size, args.depth_override,
            best=not args.latest,
        )
        print(f"Restoring {len(files)} images with depth-{info['depth']} model "
              f"(scale {args.scale}, tiles {args.patch_size}px, overlap {args.overlap}px).")

        if args.assume_lr:
            @jax.jit
            def forward(tiles):
                return jnp.clip(state.apply_fn({"params": state.params}, tiles), 0.0, 1.0)
        else:
            @jax.jit
            def forward(tiles):
                lr = degrade(tiles, args.scale, args.patch_size)
                return jnp.clip(state.apply_fn({"params": state.params}, lr), 0.0, 1.0)

    out_dir = args.output_dir.expanduser()
    out_dir.mkdir(parents=True, exist_ok=True)
    for path in files:
        image = load_rgb_image_full(path)
        restored = restore_image(image, forward, args.patch_size, args.overlap, args.batch_size)
        target = out_dir / (Path(path).stem + "_restored.png")
        u8 = (np.round(restored * 255.0)).astype(np.uint8)
        try:
            import cv2

            cv2.imwrite(str(target), u8[..., ::-1])
        except Exception:
            target = target.with_suffix(".npy")
            np.save(target, restored)
        print(f"  {Path(path).name} -> {target.name}")
    print(f"[done] {len(files)} restored images in {out_dir}")


if __name__ == "__main__":
    main()
