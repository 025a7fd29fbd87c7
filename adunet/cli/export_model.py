"""Export a trained SR checkpoint to a self-contained serving artifact.

Completes the deployment path the reference never had (its `.keras` files
need the training repo's custom-object registry to load —
evaluate_model.py:57-91). The artifact is StableHLO with weights baked in;
`adunet.export.load_artifact` (or any plain jax.export consumer) runs it on
CPU or TPU without importing the model code. `cli/restore.py --from-export`
consumes it for tiled batch restoration.
"""

from __future__ import annotations

import argparse
from pathlib import Path
from typing import List, Optional


def parse_args(argv: Optional[List[str]] = None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(description="Export a trained model to a StableHLO serving artifact.")
    parser.add_argument("--workload", choices=["sr", "seg", "joint"], default="sr")
    parser.add_argument("--model-path", type=Path, required=True,
                        help="Orbax checkpoint root (directory written by train_sr / train_seg).")
    parser.add_argument("--scale", type=float, default=None,
                        help="SR encoder shrink ratio (required for --workload sr).")
    parser.add_argument("--output-dir", type=Path, required=True)
    parser.add_argument("--patch-size", type=int, default=None,
                        help="Static spatial size of the exported program. SR default: "
                             "256. seg/joint default: the checkpoint's training "
                             "image_size (the convolutional models are size-agnostic, "
                             "so any explicit size is honored).")
    parser.add_argument("--batch-size", type=int, default=8,
                        help="Static tile-batch size of the exported program.")
    parser.add_argument("--platforms", type=str, default="tpu,cpu",
                        help="Comma-separated lowering targets baked into the artifact.")
    parser.add_argument("--quantize", choices=["int8"], default=None,
                        help="Weight-only quantization: conv kernels baked as int8 + "
                             "per-channel scales (~4x smaller artifact; dequantized "
                             "inside the program).")
    parser.add_argument("--depth-override", type=int, default=None)
    parser.add_argument("--latest", action="store_true",
                        help="Export the most recent checkpoint instead of the best-val one.")
    return parser.parse_args(argv)


def load_seg_checkpoint_state(model_path: Path, depth_override=None, best: bool = True):
    """Rebuild the protocol seg U-Net from the checkpoint's config.json and
    restore Orbax weights + BatchNorm statistics."""
    import json

    import jax
    import jax.numpy as jnp

    from adunet.models import build_adaptive_depth_unet
    from adunet.train import CheckpointManager, create_train_state, make_optimizer

    model_path = Path(model_path).expanduser()
    cfg_file = model_path / "config.json"
    if not cfg_file.exists():
        # silently guessing the architecture would let a wrong-sized default
        # model restore successfully (conv params are size-agnostic)
        raise FileNotFoundError(
            f"{cfg_file} not found — the seg checkpoint predates the end-of-run "
            "config dump (interrupted run?); cannot rebuild the architecture."
        )
    saved = json.loads(cfg_file.read_text())
    image_size = int(saved.get("image_size", 256))
    depth = int(depth_override or saved.get("depth", 4))
    base_channels = int(saved.get("base_channels", 64))

    model = build_adaptive_depth_unet(image_size, base_channels=base_channels, depth=depth)
    sample = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
    state = create_train_state(model, jax.random.key(0), sample, make_optimizer(1e-3))
    mngr = CheckpointManager(model_path, monitor="val_dice", mode="max")
    # weights-only restore: the serving consumer need not reconstruct the
    # training-time optimizer (protocol cosine schedules etc.) just to load
    restored = (mngr.restore_best_weights(state) if best
                else mngr.restore_latest_weights(state))
    mngr.close()
    if restored is None:
        raise FileNotFoundError(f"No checkpoints found under {model_path}")
    return restored, model, {"image_size": image_size, "depth": depth,
                             "base_channels": base_channels}


def load_joint_checkpoint_state(model_path: Path, best: bool = True):
    """Rebuild the joint SR+seg model from the checkpoint's config.json and
    restore weights."""
    import json

    import jax
    import jax.numpy as jnp

    from adunet.models import build_joint_unet
    from adunet.train import CheckpointManager, create_train_state, make_optimizer

    model_path = Path(model_path).expanduser()
    cfg_file = model_path / "config.json"
    if not cfg_file.exists():
        raise FileNotFoundError(
            f"{cfg_file} not found — cannot rebuild the joint architecture "
            "(interrupted run?)."
        )
    saved = json.loads(cfg_file.read_text())
    image_size = int(saved.get("image_size", 256))
    model, info = build_joint_unet(
        scale=float(saved.get("scale", 0.5)),
        base_channels=int(saved.get("base_channels", 64)),
        residual_head_channels=int(saved.get("residual_head_channels", 64)),
        num_classes=int(saved.get("num_classes", 1)),
        depth_override=int(saved["depth"]) if "depth" in saved else None,
        input_size=image_size,
    )
    sample = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
    state = create_train_state(model, jax.random.key(0), sample, make_optimizer(1e-4))
    # train_joint monitors val_loss only when validation dirs were given;
    # otherwise it checkpoints on train loss — selecting on a metric no
    # checkpoint carries would tie every step at -inf and pick arbitrarily
    monitor = "val_loss" if saved.get("val_image_dir") else "loss"
    mngr = CheckpointManager(model_path, monitor=monitor, mode="min")
    restored = (mngr.restore_best_weights(state) if best
                else mngr.restore_latest_weights(state))
    mngr.close()
    if restored is None:
        raise FileNotFoundError(f"No checkpoints found under {model_path}")
    info = dict(info)
    info["image_size"] = image_size
    return restored, model, info


def main(argv: Optional[List[str]] = None) -> None:
    from adunet.utils.runtime import setup_runtime

    setup_runtime()
    args = parse_args(argv)

    import jax
    import numpy as np

    from adunet.export import export_seg_forward, export_sr_forward, save_artifact

    platforms = tuple(p.strip() for p in args.platforms.split(",") if p.strip())
    if args.workload == "sr":
        if args.scale is None:
            raise SystemExit("--scale is required for --workload sr")
        from adunet.cli.evaluate import load_checkpoint_state

        patch_size = args.patch_size or 256
        state, _model, info = load_checkpoint_state(
            args.model_path, args.scale, patch_size, args.depth_override,
            best=not args.latest,
        )
        exported = export_sr_forward(
            state, patch_size=patch_size, batch_size=args.batch_size,
            platforms=platforms, quantize=args.quantize,
        )
        meta = {"model": "adaptive_sr_unet", "scale": args.scale, "depth": info["depth"]}
    elif args.workload == "seg":
        state, _model, info = load_seg_checkpoint_state(
            args.model_path, args.depth_override, best=not args.latest,
        )
        size = args.patch_size or info["image_size"]
        exported = export_seg_forward(
            state, image_size=size, batch_size=args.batch_size,
            platforms=platforms, quantize=args.quantize,
        )
        meta = {"model": "adaptive_seg_unet", "depth": info["depth"],
                "image_size": size}
    else:
        from adunet.export import export_joint_forward

        state, _model, info = load_joint_checkpoint_state(
            args.model_path, best=not args.latest,
        )
        size = args.patch_size or info["image_size"]
        exported = export_joint_forward(
            state, image_size=size, batch_size=args.batch_size,
            platforms=platforms, quantize=args.quantize,
        )
        meta = {"model": "joint_sr_seg_unet", "depth": info["depth"],
                "image_size": size}

    if args.quantize:
        meta["quantization"] = f"{args.quantize}-weight-only"
    meta.update(
        param_count=int(sum(
            int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(state.params)
        )),
        checkpoint=str(Path(args.model_path).expanduser()),
    )
    out = save_artifact(exported, args.output_dir, meta=meta)
    size_mb = sum(f.stat().st_size for f in out.iterdir() if f.is_file()) / 1e6
    print(f"[export] {meta['model']} depth-{info['depth']} -> {out} "
          f"({size_mb:.2f} MB, platforms={list(platforms)}"
          + (f", {args.quantize} weight-only" if args.quantize else "") + ")")


if __name__ == "__main__":
    main()
