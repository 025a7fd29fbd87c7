"""Offline evaluation CLI.

Rebuild of /root/reference/Super_resolution/code/evaluate_model.py (call
stack SURVEY.md §3.3): checkpoint load via config-driven rebuild, grid
tiling of the HR dir, synthetic LR at --scale, Y-channel metrics with
border shave, reference-schema reports.
"""

from __future__ import annotations

import argparse
import json
from datetime import datetime
from pathlib import Path
from typing import List, Optional


def parse_args(argv: Optional[List[str]] = None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(description="Offline grid-tile evaluation of a trained SR checkpoint.")
    parser.add_argument("--model-path", type=Path, required=True,
                        help="Orbax checkpoint root (directory written by train_sr).")
    parser.add_argument("--scale", type=float, required=True)
    parser.add_argument("--hr-dir", type=Path, required=True)
    parser.add_argument("--image-suffix", type=str, default=".png")
    parser.add_argument("--patch-size", type=int, default=256)
    parser.add_argument("--eval-stride", type=int, default=None)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--limit", type=int, default=None)
    parser.add_argument("--eval-shave", type=int, default=None)
    parser.add_argument("--depth-override", type=int, default=None)
    parser.add_argument("--latest", action="store_true",
                        help="Load the most recent checkpoint instead of the best-val one. "
                             "The default (best) matches the reference protocol, which "
                             "evaluates the ModelCheckpoint output (evaluate_model.py:57-91).")
    parser.add_argument("--best", action="store_true", help=argparse.SUPPRESS)  # legacy no-op
    parser.add_argument("--output-dir", type=Path, default=Path("runs/evaluation"))
    parser.add_argument("--run-name", type=str, default=None)
    parser.add_argument("--skip-per-image", action="store_true")
    return parser.parse_args(argv)


def load_checkpoint_state(
    model_path: Path,
    scale: float,
    patch_size: int,
    depth_override: Optional[int],
    best: bool = False,
):
    """Rebuild the architecture from config.json and restore Orbax weights —
    the TPU-native replacement for custom-object .keras loading
    (evaluate_model.py:57-91)."""
    import jax
    import jax.numpy as jnp

    from adunet.models import build_super_resolution_unet
    from adunet.train import CheckpointManager, create_train_state, make_optimizer

    model_path = Path(model_path).expanduser()
    cfg_file = model_path / "config.json"
    overrides = {}
    if cfg_file.exists():
        saved = json.loads(cfg_file.read_text())
        overrides = {
            "base_channels": saved.get("base_channels", 64),
            "residual_head_channels": saved.get("residual_head_channels", 64),
            "max_depth": saved.get("max_depth", 7),
        }
        if depth_override is None:
            depth_override = saved.get("depth")
    elif depth_override is None:
        # without the config dump AND without an explicit depth, rebuilding
        # from scale-derived defaults is architecture guesswork — restore
        # either fails with an opaque tree mismatch or silently loads the
        # wrong widths (the seg/joint loaders hard-error the same way)
        raise FileNotFoundError(
            f"{cfg_file} not found (interrupted run?) and no --depth-override "
            "given; cannot rebuild the architecture safely."
        )

    model, info = build_super_resolution_unet(
        scale=scale,
        depth_override=depth_override,
        input_size=patch_size,
        **overrides,
    )
    sample = jnp.zeros((1, patch_size, patch_size, 3), jnp.float32)
    state = create_train_state(model, jax.random.key(0), sample, make_optimizer(1e-4))
    mngr = CheckpointManager(model_path, monitor="val_loss", mode="min")
    restored = mngr.restore_best(state) if best else mngr.restore_latest(state)
    mngr.close()
    if restored is None:
        raise FileNotFoundError(f"No checkpoints found under {model_path}")
    return restored, model, info


def main(argv: Optional[List[str]] = None) -> None:
    from adunet.utils.runtime import setup_runtime

    setup_runtime()
    args = parse_args(argv)

    from adunet.data import find_images, make_eval_patch_dataset
    from adunet.evaluate import attach_filenames, evaluate_sr, infer_eval_shave, write_outputs

    hr_files = find_images(args.hr_dir, args.image_suffix, args.limit)

    eval_ds, total_patches, patch_labels = make_eval_patch_dataset(
        hr_files,
        patch_size=args.patch_size,
        scale=args.scale,
        batch_size=args.batch_size,
        stride=args.eval_stride,
    )

    state, _model, info = load_checkpoint_state(
        args.model_path, args.scale, args.patch_size, args.depth_override,
        best=not args.latest,
    )

    eval_shave = infer_eval_shave(args.scale, args.eval_shave)

    # Multi-chip: shard the patch stream over a DP mesh so each chip scores
    # 1/N of the tiles (params replicated once up front).
    import jax

    mesh = None
    if jax.process_count() == 1 and len(jax.devices()) > 1:
        from adunet.parallel.mesh import make_mesh, replicate

        mesh = make_mesh()
        state = replicate(state, mesh)
    summary, per_patch = evaluate_sr(
        state, eval_ds, eval_scale=args.scale, eval_shave=eval_shave, mesh=mesh
    )
    attach_filenames(per_patch, patch_labels)

    print(f"Scored {summary.samples} patches across {len(hr_files)} images.")
    print(f"  PSNR(Y):     {summary.psnr_mean:.4f} +/- {summary.psnr_std:.4f} dB")
    print(f"  SSIM(Y):     {summary.ssim_mean:.4f} +/- {summary.ssim_std:.4f}")
    print(f"  MS-SSIM(Y):  {summary.msssim_mean:.4f} +/- {summary.msssim_std:.4f}")
    print(f"  MSE(Y):      {summary.mse_mean:.6f} +/- {summary.mse_std:.6f}")

    timestamp = datetime.now().strftime("%Y%m%d-%H%M%S")
    run_name = args.run_name or f"scale{args.scale:.2f}_{timestamp}"
    run_dir = Path(args.output_dir).expanduser() / run_name

    config_payload = {
        "model_path": str(Path(args.model_path).expanduser()),
        "scale": args.scale,
        "hr_dir": str(args.hr_dir),
        "patch_size": args.patch_size,
        "eval_stride": args.eval_stride or args.patch_size,
        "batch_size": args.batch_size,
        "limit": args.limit,
        "eval_shave": eval_shave,
        "depth_override": args.depth_override,
        "depth": info["depth"],
        "samples": summary.samples,
        "images": len(hr_files),
        "created_at": timestamp,
    }
    write_outputs(run_dir, summary, per_patch, config_payload, not args.skip_per_image)
    print(f"[done] Evaluation report at {run_dir}")


if __name__ == "__main__":
    main()
