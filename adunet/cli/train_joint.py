"""Joint SR + segmentation shared-encoder training CLI (BASELINE config 5).

Trains adunet.models.joint.JointSRSegUNet data-parallel over a Mesh: the
image/mask pairs feed one fused step that degrades the image on device,
restores it through the SR decoder, and segments it through the seg decoder
off the shared encoder. Composes the reference's two workloads
(Super_resolution/code/train_adaptive_unet.py + Segmenation/code/
unet_vinillia.py) into the multi-task configuration the reference never
shipped but BASELINE.json names as a target capability.
"""

from __future__ import annotations

import argparse
import json
from datetime import datetime
from pathlib import Path
from typing import List, Optional

import numpy as np


def parse_args(argv: Optional[List[str]] = None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        description="Train the joint SR+segmentation shared-encoder U-Net (TPU)."
    )
    parser.add_argument("--train_image_dir", type=Path, required=True)
    parser.add_argument("--train_mask_dir", type=Path, required=True)
    parser.add_argument("--val_image_dir", type=Path, default=None)
    parser.add_argument("--val_mask_dir", type=Path, default=None)
    parser.add_argument("--image_suffix", type=str, default=".jpg")
    parser.add_argument("--mask_suffix", type=str, default="_segmentation.png")
    parser.add_argument("--image_size", type=int, default=256)
    parser.add_argument("--scale", type=float, default=0.5,
                        help="Encoder shrink ratio AND LR degradation factor.")
    parser.add_argument("--depth_override", type=int, default=None)
    parser.add_argument("--base_channels", type=int, default=64)
    parser.add_argument("--residual_head_channels", type=int, default=64)
    parser.add_argument("--num_classes", type=int, default=1)
    parser.add_argument("--sr_loss", type=str, default="charbonnier", choices=["charbonnier", "l1"])
    parser.add_argument("--sr_weight", type=float, default=1.0)
    parser.add_argument("--seg_weight", type=float, default=1.0)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--epochs", type=int, default=60)
    parser.add_argument("--learning_rate", type=float, default=1e-4)
    parser.add_argument("--patience", type=int, default=10)
    parser.add_argument("--seed", type=int, default=23)
    parser.add_argument("--limit_train", type=int, default=None)
    parser.add_argument("--limit_val", type=int, default=None)
    parser.add_argument("--mixed_precision", action="store_true")
    parser.add_argument("--async_checkpoint", action="store_true",
                        help="Overlap per-epoch checkpoint writes with compute (Orbax async).")
    parser.add_argument("--remat", action="store_true")
    parser.add_argument("--model_dir", type=Path, default=Path("runs/models"))
    parser.add_argument("--log_dir", type=Path, default=Path("runs/logs"))
    parser.add_argument("--run_name", type=str, default="joint_sr_seg")
    parser.add_argument("--n_devices", type=int, default=None)
    return parser.parse_args(argv)


def train(args: argparse.Namespace) -> dict:
    import jax
    import jax.numpy as jnp

    from adunet.data import discover_pairs
    from adunet.data.seg_pipeline import SegPairDataset
    from adunet.losses import charbonnier_loss, l1_loss, make_bce_dice_loss, make_weighted_ce_loss
    from adunet.models import build_joint_unet
    from adunet.parallel import (
        auto_data_parallel_size,
        make_mesh,
        maybe_initialize_distributed,
        replicate,
    )
    from adunet.train import (
        CheckpointManager,
        create_train_state,
        fit,
        repeat,
        make_joint_eval_step,
        make_joint_train_step,
        make_optimizer,
    )

    maybe_initialize_distributed()

    from adunet.parallel.distributed import process_shard

    train_pairs = discover_pairs(
        args.train_image_dir.expanduser(), args.train_mask_dir.expanduser(),
        args.image_suffix, args.mask_suffix, args.limit_train,
    )
    train_pairs = process_shard(train_pairs, seed=args.seed)  # multi-host slice (equal lengths)
    val_pairs = None
    if args.val_image_dir is not None and args.val_mask_dir is not None:
        val_pairs = discover_pairs(
            args.val_image_dir.expanduser(), args.val_mask_dir.expanduser(),
            args.image_suffix, args.mask_suffix, args.limit_val,
        )
    print(f"Loaded {len(train_pairs)} train pairs"
          + (f", {len(val_pairs)} val pairs." if val_pairs else "."))

    train_ds = SegPairDataset(
        train_pairs, batch_size=args.batch_size, image_size=args.image_size,
        augment=False, shuffle=True, seed=args.seed, num_classes=args.num_classes,
        drop_remainder=True,  # batches shard over the mesh: no ragged tails
    )
    val_ds = None
    if val_pairs:
        val_ds = SegPairDataset(
            val_pairs, batch_size=args.batch_size, image_size=args.image_size,
            augment=False, shuffle=False, seed=args.seed, num_classes=args.num_classes,
        )
    steps_per_epoch = train_ds.steps_per_epoch

    dtype = jnp.bfloat16 if args.mixed_precision else jnp.float32
    model, info = build_joint_unet(
        scale=args.scale,
        base_channels=args.base_channels,
        residual_head_channels=args.residual_head_channels,
        num_classes=args.num_classes,
        depth_override=args.depth_override,
        input_size=args.image_size,
        dtype=dtype,
        remat=args.remat,
    )

    sr_loss_fn = charbonnier_loss if args.sr_loss == "charbonnier" else l1_loss
    if args.num_classes > 1:
        seg_loss_fn = make_weighted_ce_loss([1.0] * args.num_classes)
    else:
        seg_loss_fn = make_bce_dice_loss(0.5, 1.0)

    # Batch-vs-mesh policy (same rule as train_sr/train_seg): auto-cap the
    # data axis to the largest batch divisor when --n_devices is not given.
    n_devices = args.n_devices
    if n_devices is None and jax.process_count() == 1:
        avail = jax.device_count()
        n_devices = auto_data_parallel_size(args.batch_size, avail)
        if n_devices < avail:
            print(
                f"[mesh] data axis auto-capped to {n_devices} of {avail} devices "
                f"(batch_size={args.batch_size}).",
                flush=True,
            )
    mesh = make_mesh(n_devices)
    n_dev = int(np.prod(mesh.devices.shape))
    # batch_size is per-process: the global batch (batch_size x process_count)
    # must split evenly over the data axis (train_sr uses the same rule)
    local_dp = max(1, n_dev // jax.process_count())
    if args.batch_size % local_dp != 0:
        raise ValueError(
            f"batch_size={args.batch_size} must be divisible by the per-process "
            f"data-axis share ({local_dp})."
        )

    sample = jnp.zeros((1, args.image_size, args.image_size, 3), jnp.float32)
    state = create_train_state(
        model, jax.random.key(args.seed), sample, make_optimizer(args.learning_rate)
    )
    state = replicate(state, mesh)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(state.params))

    timestamp = datetime.now().strftime("%Y%m%d-%H%M%S")
    run_dir = Path(args.log_dir).expanduser() / f"{args.run_name}_{timestamp}"
    run_dir.mkdir(parents=True, exist_ok=True)
    ckpt_dir = Path(args.model_dir).expanduser() / f"{args.run_name}_best"
    monitor = "val_loss" if val_ds is not None else "loss"
    ckpt = CheckpointManager(
        ckpt_dir, monitor=monitor, mode="min", async_save=args.async_checkpoint
    )

    config_payload = {
        **{k: str(v) if isinstance(v, Path) else v for k, v in vars(args).items()},
        "depth": info["depth"],
        "bottleneck_size": info["bottleneck_size"],
        "n_params": n_params,
        "n_devices": n_dev,
        "steps_per_epoch": steps_per_epoch,
        "created_at": timestamp,
    }
    from adunet.parallel.distributed import is_main_process

    main = is_main_process()  # host-side artifacts are process-0-only
    if main:
        (run_dir / "config.json").write_text(json.dumps(config_payload, indent=2, default=str))
    if main:
        ckpt.write_config(config_payload)
    print(f"Joint model: depth={info['depth']} params={n_params:,} devices={n_dev}")

    train_step = make_joint_train_step(
        model, sr_loss_fn, seg_loss_fn,
        sr_weight=args.sr_weight, seg_weight=args.seg_weight, data_scale=args.scale,
    )
    eval_step = make_joint_eval_step(
        model, sr_loss_fn, seg_loss_fn,
        sr_weight=args.sr_weight, seg_weight=args.seg_weight, data_scale=args.scale,
        per_sample=True,
    )

    result = fit(
        state,
        repeat(train_ds),
        train_step,
        steps_per_epoch=steps_per_epoch,
        epochs=args.epochs,
        rng=jax.random.key(args.seed),
        val_data=val_ds,
        val_step=eval_step if val_ds is not None else None,
        monitor=monitor,
        monitor_mode="min",
        patience=args.patience,
        restore_best_weights=True,
        ckpt=ckpt,
        mesh=mesh,
        log_dir=run_dir if main else None,
        val_per_sample=True,
    )

    payload = {
        "run_name": args.run_name,
        "n_params": n_params,
        "depth": info["depth"],
        "epochs_ran": len(result.history),
        "best_epoch": result.best_epoch,
        "best_val_loss": result.best_metric,
        "final_metrics": result.history[-1].row() if result.history else {},
        "checkpoint": str(ckpt_dir),
        "created_at": timestamp,
    }
    if main:
        (run_dir / "result.json").write_text(json.dumps(payload, indent=2, default=str))
    ckpt.close()
    return payload


def main(argv: Optional[List[str]] = None) -> None:
    from adunet.utils.runtime import setup_runtime

    setup_runtime()
    train(parse_args(argv))


if __name__ == "__main__":
    main()
