"""Vanilla (baseline) segmentation U-Net training CLI.

Rebuild of /root/reference/Segmenation/code/unet_vinillia.py: generic
image/mask pairing (ISIC + Cityscapes-style suffixes), flips-only
augmentation, LayerNorm U-Net with Conv2DTranspose decoder, BCE loss with
accuracy/precision/recall/global-dice metrics, best-val-dice checkpointing,
early stopping, and ReduceLROnPlateau (factor 0.5, patience 5, min 1e-6).
"""

from __future__ import annotations

import argparse
import json
import math
from datetime import datetime
from pathlib import Path
from typing import List, Optional

import numpy as np


def parse_args(argv: Optional[List[str]] = None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(description="Train a baseline U-Net for binary segmentation (TPU).")
    parser.add_argument("--train_image_dir", type=Path, required=True)
    parser.add_argument("--train_mask_dir", type=Path, required=True)
    parser.add_argument("--val_image_dir", type=Path, required=True)
    parser.add_argument("--val_mask_dir", type=Path, required=True)
    parser.add_argument("--image_suffix", type=str, default=".jpg")
    parser.add_argument("--mask_suffix", type=str, default="_segmentation.png")
    parser.add_argument("--image_size", type=int, default=256)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--epochs", type=int, default=60)
    parser.add_argument("--learning_rate", type=float, default=1e-4)
    parser.add_argument("--base_channels", type=int, default=32)
    parser.add_argument("--depth", type=int, default=4)
    parser.add_argument("--num_classes", type=int, default=1,
                        help=">1 switches to the softmax head, class-weighted CE loss and "
                             "mIoU eval (reference unet_vinillia.py:89-90 multiclass surface).")
    parser.add_argument("--class_weights", type=str, default=None,
                        help="Comma-separated per-class CE weights, e.g. '0.5,2.0,1.0'. "
                             "Defaults to uniform. Only used when --num_classes > 1.")
    parser.add_argument("--model_dir", type=Path, default=Path("runs/models"))
    parser.add_argument("--log_dir", type=Path, default=Path("runs/logs"))
    parser.add_argument("--run_name", type=str, default="unet_isic")
    parser.add_argument("--seed", type=int, default=13)
    parser.add_argument("--limit_train", type=int, default=None)
    parser.add_argument("--limit_val", type=int, default=None)
    parser.add_argument("--augment", action="store_true")
    parser.add_argument("--mixed_precision", action="store_true")
    parser.add_argument("--async_checkpoint", action="store_true",
                        help="Overlap per-epoch checkpoint writes with compute (Orbax async).")
    parser.add_argument("--n_devices", type=int, default=None)
    return parser.parse_args(argv)


def train(args: argparse.Namespace) -> dict:
    import jax
    import jax.numpy as jnp

    from adunet.data import discover_pairs
    from adunet.data.seg_pipeline import SegPairDataset
    from adunet.losses import binary_crossentropy, make_weighted_ce_loss
    from adunet.metrics import (
        binary_accuracy,
        pooled_global_dice,
        pooled_mean_iou,
        pooled_precision,
        pooled_recall,
    )
    from adunet.models import build_unet
    from adunet.parallel import make_mesh, maybe_initialize_distributed, replicate
    from adunet.train import (
        CheckpointManager,
        create_train_state,
        fit,
        repeat,
        make_optimizer,
        make_seg_eval_step,
        make_seg_train_step,
        metric_finalizers_of,
    )

    # must run before process_shard touches jax.process_count(), which would
    # otherwise initialise the local-only backend and pin process_count()==1
    maybe_initialize_distributed()

    train_pairs = discover_pairs(
        args.train_image_dir.expanduser(), args.train_mask_dir.expanduser(),
        args.image_suffix, args.mask_suffix, args.limit_train,
    )
    from adunet.parallel.distributed import process_shard

    train_pairs = process_shard(train_pairs, seed=args.seed)  # multi-host slice (equal lengths)
    from adunet.parallel.distributed import is_main_process

    _is_main = is_main_process()  # host-side artifacts are process-0-only
    val_pairs = discover_pairs(
        args.val_image_dir.expanduser(), args.val_mask_dir.expanduser(),
        args.image_suffix, args.mask_suffix, args.limit_val,
    )
    print(f"Discovered {len(train_pairs)} train / {len(val_pairs)} val image-mask pairs.")

    train_ds = SegPairDataset(
        train_pairs, batch_size=args.batch_size, image_size=args.image_size,
        augment=args.augment, shuffle=True, seed=args.seed,
        num_classes=args.num_classes,
        image_interp="linear",  # vanilla reference resizes BILINEAR (unet_vinillia.py:166)
        # ragged tails cannot shard over a >1-device data axis
        pad_tail=(args.n_devices or jax.device_count()) > 1 or jax.process_count() > 1,
    )
    val_ds = SegPairDataset(
        val_pairs, batch_size=args.batch_size, image_size=args.image_size,
        augment=False, shuffle=False, seed=args.seed,
        num_classes=args.num_classes,
        image_interp="linear",
    )
    steps_per_epoch = math.ceil(len(train_pairs) / args.batch_size)

    dtype = jnp.bfloat16 if args.mixed_precision else jnp.float32
    model = build_unet(
        args.image_size, num_classes=args.num_classes,
        base_channels=args.base_channels, depth=args.depth, dtype=dtype,
    )

    multiclass = args.num_classes > 1
    if multiclass:
        if args.class_weights:
            weights = [float(tok) for tok in args.class_weights.split(",")]
            if len(weights) != args.num_classes:
                raise ValueError(
                    f"--class_weights has {len(weights)} entries for "
                    f"{args.num_classes} classes."
                )
        else:
            weights = [1.0] * args.num_classes
        loss_fn = make_weighted_ce_loss(weights)
        # pooled (PooledMetric) variants keep whole-set semantics under the
        # sharded val path — a plain per-sample lift would silently turn the
        # MONITORED metric into a mean of per-image values, changing best-
        # checkpoint selection and early stopping
        extra = {
            "mean_iou": pooled_mean_iou(args.num_classes),
            "dice_coefficient": pooled_global_dice(),
        }
        monitor = "val_mean_iou"
    else:
        loss_fn = binary_crossentropy
        extra = {
            "accuracy": binary_accuracy,  # equal pixel counts: per-sample mean is exact
            "precision": pooled_precision(),
            "recall": pooled_recall(),
            "dice_coefficient": pooled_global_dice(),
        }
        monitor = "val_dice_coefficient"

    mesh = make_mesh(args.n_devices)
    n_dev = int(np.prod(mesh.devices.shape))
    # batch_size is per-process: the global batch (batch_size x process_count)
    # must split evenly over the data axis (train_sr uses the same rule)
    local_dp = max(1, n_dev // jax.process_count())
    if args.batch_size % local_dp != 0:
        raise ValueError(
            f"batch_size={args.batch_size} must be divisible by the per-process "
            f"data-axis share ({local_dp})."
        )

    tx = make_optimizer(args.learning_rate, inject_lr=True)
    sample = jnp.zeros((1, args.image_size, args.image_size, 3), jnp.float32)
    state = create_train_state(model, jax.random.key(args.seed), sample, tx)
    state = replicate(state, mesh)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(state.params))

    timestamp = datetime.now().strftime("%Y%m%d-%H%M%S")
    run_dir = Path(args.log_dir).expanduser() / f"{args.run_name}_{timestamp}"
    run_dir.mkdir(parents=True, exist_ok=True)
    ckpt_dir = Path(args.model_dir).expanduser() / f"{args.run_name}_best"
    print(f"Checkpoints will be written to {ckpt_dir}")

    ckpt = CheckpointManager(
        ckpt_dir, monitor=monitor, mode="max", async_save=args.async_checkpoint
    )

    train_step = make_seg_train_step(
        model, loss_fn,
        augment="flips" if args.augment else "none",
        extra_metrics=extra,
    )
    eval_step = make_seg_eval_step(model, loss_fn, extra_metrics=extra,
                                   per_sample=True)

    result = fit(
        state,
        repeat(train_ds),
        train_step,
        steps_per_epoch=steps_per_epoch,
        epochs=args.epochs,
        rng=jax.random.key(args.seed),
        val_data=val_ds,
        val_step=eval_step,
        monitor=monitor,
        monitor_mode="max",
        patience=10,
        restore_best_weights=True,
        reduce_lr_on_plateau={"monitor": "val_loss", "mode": "min",
                              "factor": 0.5, "patience": 5, "min_lr": 1e-6},
        ckpt=ckpt,
        mesh=mesh,
        log_dir=run_dir if _is_main else None,
        val_per_sample=True,
        metric_finalizers=metric_finalizers_of(extra),
    )
    state = result.state

    final_dir = Path(args.model_dir).expanduser() / f"{args.run_name}_final"
    final_ckpt = CheckpointManager(final_dir, monitor=monitor, mode="max")
    final_ckpt.save(len(result.history), state)
    final_ckpt.close()

    payload = {
        "run_name": args.run_name,
        "n_params": n_params,
        "num_classes": args.num_classes,
        "monitor": monitor,
        "epochs_ran": len(result.history),
        "best_epoch": result.best_epoch,
        "best_val_metric": result.best_metric,
        "best_val_dice": result.best_metric,
        "checkpoint": str(ckpt_dir),
        "final_checkpoint": str(final_dir),
        "created_at": timestamp,
    }
    if _is_main:
        (run_dir / "config.json").write_text(json.dumps(payload, indent=2, default=str))
    ckpt.close()
    return payload


def main(argv: Optional[List[str]] = None) -> None:
    from adunet.utils.runtime import setup_runtime

    setup_runtime()
    train(parse_args(argv))


if __name__ == "__main__":
    main()
