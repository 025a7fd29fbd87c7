"""ISIC-2017 segmentation protocol training CLI.

TPU-native rebuild of /root/reference/Segmenation/code/train_adaptive_unet.py
(call stack SURVEY.md §3.2): ISIC pairing → host decode/resize with
on-device augmentation → adaptive-depth U-Net (BatchNorm blocks) →
protocol-driven hybrid loss + optimizer (cosine for A) → fit with
best-val-dice checkpointing → final val evaluation → config.json dump.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import math
from datetime import datetime
from pathlib import Path
from typing import List, Optional

import numpy as np


def parse_args(argv: Optional[List[str]] = None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(description="Train Adaptive-Depth U-Net on ISIC-2017 segmentation (TPU).")
    parser.add_argument("--protocol", type=str, choices=["A", "B"], default="A")
    parser.add_argument("--epochs", type=int, default=0, help="Override epochs (0 keeps protocol default).")
    parser.add_argument("--batch_size", type=int, default=0, help="Override batch size (0 keeps protocol default).")
    parser.add_argument("--base_channels", type=int, default=64)
    parser.add_argument("--depth", type=int, default=4)
    parser.add_argument("--image_size", type=int, default=256)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--patience", type=int, default=None)
    parser.add_argument("--mixed_precision", action="store_true")
    parser.add_argument("--no_augment", action="store_true")
    parser.add_argument("--model_dir", type=str, default="runs/models")
    parser.add_argument("--log_dir", type=str, default="runs/logs")
    parser.add_argument("--run_name", type=str, default=None)
    parser.add_argument("--train_images", type=str, required=True)
    parser.add_argument("--train_masks", type=str, required=True)
    parser.add_argument("--val_images", type=str, required=True)
    parser.add_argument("--val_masks", type=str, required=True)
    parser.add_argument("--limit", type=int, default=None)
    parser.add_argument("--n_devices", type=int, default=None)
    parser.add_argument("--precise_bn", type=int, default=0,
                        help="Re-estimate BN population stats from N train batches "
                             "before each validation (0 = momentum EMA, Keras parity).")
    parser.add_argument("--async_checkpoint", action="store_true",
                        help="Overlap per-epoch checkpoint writes with the next epoch's "
                             "compute (Orbax async save; restores barrier first).")
    parser.add_argument("--cache_decoded", action="store_true",
                        help="Decode+resize each (image, mask) pair once and keep it in "
                             "host RAM across epochs (tf.data .cache() equivalent) — for "
                             "decode-bound hosts; corpus must fit host RAM.")
    parser.add_argument("--no_val_device_cache", dest="val_device_cache",
                        action="store_false",
                        help="Do not keep prepared validation batches device-resident "
                             "between epochs (default keeps them in HBM — right for "
                             "ISIC-scale val sets; disable when the val set competes "
                             "with a large model for device memory).")
    return parser.parse_args(argv)


def config_from_args(args: argparse.Namespace):
    from adunet.configs import SegTrainConfig

    fields = {f.name for f in dataclasses.fields(SegTrainConfig)}
    kwargs = {k: v for k, v in vars(args).items() if k in fields}
    kwargs["augment"] = not args.no_augment
    return SegTrainConfig(**kwargs).resolved()


def train(cfg) -> dict:
    import jax
    import jax.numpy as jnp

    from adunet.configs import PROTOCOLS
    from adunet.data import build_isic_dataset
    from adunet.losses import make_bce_dice_loss, make_hybrid_ce_dice_loss
    from adunet.models import build_adaptive_depth_unet
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
        make_optimizer,
        make_seg_eval_step,
        make_seg_train_step,
    )

    maybe_initialize_distributed()
    protocol = PROTOCOLS[cfg.protocol]

    # Batch-vs-mesh policy (same rule as train_sr): with no explicit
    # --n_devices, cap the data axis at the largest divisor of the batch
    # that fits the slice, so small reference batch sizes (e.g. the quick
    # runbook's bs=4) train on an 8-chip host instead of refusing. An
    # explicit --n_devices keeps the hard divisibility guard below.
    n_devices = cfg.n_devices
    if n_devices is None and jax.process_count() == 1:
        avail = jax.device_count()
        n_devices = auto_data_parallel_size(cfg.batch_size, avail)
        if n_devices < avail:
            print(
                f"[mesh] data axis auto-capped to {n_devices} of {avail} devices "
                f"(batch_size={cfg.batch_size}).",
                flush=True,
            )

    # on a >1-device mesh (or multi-host) every train batch must have the
    # compiled shape — a ragged tail cannot shard over the data axis
    pad_tail = (n_devices or jax.device_count()) > 1 or jax.process_count() > 1

    train_ds, train_count = build_isic_dataset(
        cfg.train_images,
        cfg.train_masks,
        batch_size=cfg.batch_size,
        image_size=cfg.image_size,
        augment=cfg.augment,
        shuffle=True,
        pad_tail=pad_tail,
        seed=cfg.seed,
        limit=cfg.limit,
        shard_across_processes=True,
        cache_decoded=cfg.cache_decoded,
    )
    val_ds, val_count = build_isic_dataset(
        cfg.val_images,
        cfg.val_masks,
        batch_size=cfg.batch_size,
        image_size=cfg.image_size,
        augment=False,
        shuffle=False,
        seed=cfg.seed,
        limit=cfg.limit,
        cache_decoded=cfg.cache_decoded,
    )
    steps_per_epoch = math.ceil(train_count / cfg.batch_size)

    dtype = jnp.bfloat16 if cfg.mixed_precision else jnp.float32
    model = build_adaptive_depth_unet(
        input_size=cfg.image_size,
        base_channels=cfg.base_channels,
        depth=cfg.depth,
        dtype=dtype,
    )

    if protocol.loss == "hybrid_ce_dice":
        loss_fn = make_hybrid_ce_dice_loss(protocol.loss_alpha, protocol.loss_beta)
    else:
        loss_fn = make_bce_dice_loss(protocol.loss_alpha, protocol.loss_beta)

    tx = make_optimizer(
        protocol.initial_lr,
        cosine_decay_steps=(cfg.epochs * max(steps_per_epoch, 1)) if protocol.cosine_schedule else None,
    )

    mesh = make_mesh(n_devices)
    n_dev = int(np.prod(mesh.devices.shape))
    # batch_size is per-process: the global batch (batch_size x process_count)
    # must split evenly over the data axis (train_sr uses the same rule)
    local_dp = max(1, n_dev // jax.process_count())
    if cfg.batch_size % local_dp != 0:
        raise ValueError(
            f"batch_size={cfg.batch_size} must be divisible by the per-process "
            f"data-axis share ({local_dp})."
        )

    sample = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
    state = create_train_state(model, jax.random.key(cfg.seed), sample, tx, train=False)
    state = replicate(state, mesh)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(state.params))

    timestamp = datetime.now().strftime("%Y%m%d-%H%M%S")
    run_name = cfg.run_name or f"protocol{protocol.key}_seed{cfg.seed}_{timestamp}"
    run_dir = Path(cfg.log_dir).expanduser() / run_name
    run_dir.mkdir(parents=True, exist_ok=True)
    model_dir = Path(cfg.model_dir).expanduser()
    ckpt_dir = model_dir / run_name

    print(f"Model: depth={cfg.depth} params={n_params:,} devices={n_dev} protocol={protocol.key}")
    try:
        from flax import linen as nn

        table = nn.tabulate(model, jax.random.key(0), compute_flops=False)(sample, train=False)
    except Exception:
        table = repr(model)
    from adunet.parallel.distributed import is_main_process

    main = is_main_process()  # host-side artifacts are process-0-only
    if main:
        (run_dir / "model_summary.txt").write_text(f"{table}\nTotal params: {n_params:,}\n")

    ckpt = CheckpointManager(
        ckpt_dir, monitor="val_dice", mode="max", async_save=cfg.async_checkpoint
    )

    try:
        from tensorboardX import SummaryWriter

        tb_writer = SummaryWriter(str(run_dir)) if main else None
    except Exception:
        tb_writer = None

    train_step = make_seg_train_step(model, loss_fn, augment=cfg.augment)
    eval_step = make_seg_eval_step(model, loss_fn, per_sample=True)

    pre_val_hook = None
    if cfg.precise_bn > 0:
        from adunet.train.seg import (
            make_bn_refresh_step,
            precise_batch_stats,
            snapshot_refresh_batches,
        )

        refresh = make_bn_refresh_step()
        # The refresh inputs are un-augmented training images — identical
        # every epoch — so decode + device-transfer them ONCE and keep them
        # device-resident; each epoch then costs N jitted forwards. (A fused
        # lax.scan single-program variant exists — make_precise_bn_program —
        # but this environment's remote compile service takes tens of
        # minutes on it, so the CLI uses the per-batch programs, which share
        # the train step's cached compilation budget. BN statistics average
        # over batch x H x W positions, so even a few batches estimate them
        # tightly — keep --precise_bn small where dispatch latency matters.)
        # snapshot_refresh_batches decodes straight from the pair list so the
        # training shuffle-epoch counter is untouched: batch order is
        # IDENTICAL with and without --precise_bn.
        put = (lambda x: replicate(x, mesh)) if mesh is not None else jnp.asarray
        refresh_batches = snapshot_refresh_batches(train_ds, cfg.precise_bn, put)

        def pre_val_hook(s_):
            return precise_batch_stats(s_, refresh_batches, refresh)

    result = fit(
        state,
        repeat(train_ds),
        train_step,
        steps_per_epoch=steps_per_epoch,
        epochs=cfg.epochs,
        rng=jax.random.key(cfg.seed),
        val_data=val_ds,
        val_step=eval_step,
        monitor="val_dice",
        monitor_mode="max",
        patience=cfg.patience,
        restore_best_weights=True,
        ckpt=ckpt,
        mesh=mesh,
        log_dir=run_dir if main else None,
        tb_writer=tb_writer,
        val_per_sample=True,
        pre_val_hook=pre_val_hook,
        cache_val_on_device=cfg.val_device_cache,
    )
    state = result.state

    # final val evaluation (reference :546)
    vdicts, vweights = [], []
    for images, masks in val_ds:
        out = eval_step(state, (jnp.asarray(images), jnp.asarray(masks)))
        vdicts.append({k: float(np.mean(np.asarray(v))) for k, v in out.items()})
        vweights.append(images.shape[0])
    total = sum(vweights)
    eval_metrics = {
        k: float(sum(d[k] * w for d, w in zip(vdicts, vweights)) / total) for k in vdicts[0]
    }

    config_payload = {
        "protocol": protocol.key,
        "description": protocol.description,
        "epochs_requested": cfg.epochs,
        "epochs_ran": len(result.history),
        "initial_lr": protocol.initial_lr,
        "batch_size": cfg.batch_size,
        "image_size": cfg.image_size,
        "depth": cfg.depth,
        "base_channels": cfg.base_channels,
        "n_params": n_params,
        "n_devices": n_dev,
        "train_samples": train_count,
        "val_samples": val_count,
        "train_steps_per_epoch": steps_per_epoch,
        "seed": cfg.seed,
        "mixed_precision": bool(cfg.mixed_precision),
        "threshold": cfg.threshold,
        "model_checkpoint": str(ckpt_dir),
        "train_images": str(cfg.train_images),
        "train_masks": str(cfg.train_masks),
        "val_images": str(cfg.val_images),
        "val_masks": str(cfg.val_masks),
        "metrics": eval_metrics,
        "created_at": timestamp,
    }
    if main:
        (run_dir / "config.json").write_text(json.dumps(config_payload, indent=2, default=str))
    if main:
        ckpt.write_config(config_payload)

    print("Validation metrics:")
    for key, value in eval_metrics.items():
        print(f"  {key}: {value:.4f}")

    if tb_writer is not None:
        tb_writer.close()
    ckpt.close()
    return {"run_dir": str(run_dir), "ckpt_dir": str(ckpt_dir), "metrics": eval_metrics}


def main(argv: Optional[List[str]] = None) -> None:
    from adunet.utils.runtime import setup_runtime

    setup_runtime()
    train(config_from_args(parse_args(argv)))


if __name__ == "__main__":
    main()
