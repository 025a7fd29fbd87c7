"""Adaptive-depth SR U-Net training CLI.

TPU-native rebuild of the reference's primary entry point
(/root/reference/Super_resolution/code/train_adaptive_unet.py, call stack
SURVEY.md §3.1): arg validation → file split → patch datasets → model build
→ train under a data-parallel mesh → post-hoc Y-channel eval, writing the
same run artifacts (config.json, model_summary.txt, epoch_metrics.csv,
TensorBoard scalars, best checkpoint, eval scalars).
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
    parser = argparse.ArgumentParser(description="Train adaptive-depth U-Net for super-resolution (TPU).")
    parser.add_argument("--scale", type=float, required=True, help="Downscale factor (0 < scale < 1).")
    parser.add_argument("--batch_size", type=int, default=4)
    parser.add_argument("--epochs", type=int, default=100)
    parser.add_argument("--learning_rate", type=float, default=1e-4)
    parser.add_argument("--loss", type=str, default="charbonnier", choices=["charbonnier", "l1", "combined"])
    parser.add_argument("--vgg19_npz", type=str, default=None,
                        help="VGG19 conv weights (.npz) for the combined loss's "
                             "perceptual term; default: seeded random weights.")
    parser.add_argument("--patience", type=int, default=10)
    parser.add_argument("--val_split", type=float, default=0.1)
    parser.add_argument("--test_split", type=float, default=0.1)
    parser.add_argument("--limit", type=int, default=None)
    parser.add_argument("--seed", type=int, default=1234)
    parser.add_argument("--patch_size", type=int, default=256)
    parser.add_argument("--patches_per_image", type=int, default=4)
    parser.add_argument("--eval_stride", type=int, default=None)
    parser.add_argument("--shuffle_buffer", type=int, default=1024)
    parser.add_argument("--eval_shave", type=int, default=None)
    parser.add_argument("--depth_override", type=int, default=None)
    parser.add_argument("--max_depth", type=int, default=7)
    parser.add_argument("--base_channels", type=int, default=64)
    parser.add_argument("--residual_head_channels", type=int, default=64)
    parser.add_argument("--mixed_precision", action="store_true", help="bf16 compute / f32 params.")
    parser.add_argument("--remat", action="store_true", help="Rematerialise conv blocks (deep models).")
    parser.add_argument("--remat_levels", type=int, default=None,
                        help="Selective remat: checkpoint only the N shallowest "
                             "levels (largest activations); overrides --remat.")
    parser.add_argument("--grad_accum", type=int, default=1,
                        help="Split each batch into N sequential micro-batches and apply "
                             "one optimizer update on the averaged gradients — exact "
                             "full-batch math at 1/N activation memory (deep 138M configs "
                             "at large effective batches). batch_size must divide by N.")
    parser.add_argument("--consistent_degradation", action="store_true",
                        help="Train-time LR degradation at --scale instead of the reference's constant 0.5.")
    parser.add_argument("--model_dir", type=str, default="runs/models")
    parser.add_argument("--log_dir", type=str, default="runs/logs")
    parser.add_argument("--run_name", type=str, default=None)
    parser.add_argument("--high_res_dir", type=str, required=False, default=None)
    parser.add_argument("--image_suffix", type=str, default=".png")
    parser.add_argument("--low_res_dir", type=str, default=None,
                        help="Directory of real LR images paired by filename. When set, "
                             "training uses whole images resized to --patch_size instead of "
                             "synthetic LR patches (reference build_dataset alt path).")
    parser.add_argument("--resume_from", type=str, default=None,
                        help="Checkpoint directory to resume from (Orbax root).")
    parser.add_argument("--initial_epoch", type=int, default=0)
    parser.add_argument("--n_devices", type=int, default=None)
    parser.add_argument("--model_shards", type=int, default=1,
                        help="Channel (tensor) parallelism degree: wide conv kernels shard "
                             "their output-channel dim over a 'model' mesh axis — for the "
                             "138M-param depth-5 configs whose replicated params+Adam state "
                             "pressure per-chip HBM.")
    parser.add_argument("--preview_patches", type=int, default=3)
    parser.add_argument("--uint8_feed", action="store_true",
                        help="Stream HR patches as uint8 and normalise on device "
                             "(4x less host->device traffic; exact for uint8 sources).")
    parser.add_argument("--cache_decoded", action="store_true",
                        help="Decode each training image once and keep its pixels in host "
                             "RAM across epoch passes (tf.data .cache() equivalent) — for "
                             "decode-bound hosts; corpus must fit host RAM.")
    parser.add_argument("--device_cache", action="store_true",
                        help="Cache the whole (uniform-size) training corpus in HBM as uint8 "
                             "and sample random patches inside the jitted step — zero "
                             "per-step host->device traffic (DIV2K fits a v5e chip).")
    parser.add_argument("--profile", action="store_true",
                        help="Capture a jax.profiler trace of the first epoch into <run_dir>/profile.")
    parser.add_argument("--async_checkpoint", action="store_true",
                        help="Overlap per-epoch checkpoint writes with the next epoch's "
                             "compute (Orbax async save; restores barrier first).")
    parser.add_argument("--ckpt_every", type=int, default=1,
                        help="Checkpoint cadence in epochs (1 = the reference's every-epoch "
                             "ModelCheckpoint). N>1 cuts the device->host state pull that "
                             "dominates epoch time for 100M+ models on remote-TPU tunnels; "
                             "the final/early-stop epoch always checkpoints.")
    return parser.parse_args(argv)


def config_from_args(args: argparse.Namespace):
    from adunet.configs import SRTrainConfig

    fields = {f.name for f in dataclasses.fields(SRTrainConfig)}
    kwargs = {k: v for k, v in vars(args).items() if k in fields}
    cfg = SRTrainConfig(**kwargs)
    cfg.validate()
    return cfg


def train(cfg) -> dict:
    import jax
    import jax.numpy as jnp

    from adunet.data import find_images, make_eval_patch_dataset, make_training_patch_dataset
    from adunet.evaluate import infer_eval_shave
    from adunet.losses import build_losses_and_metrics, make_perceptual_fn
    from adunet.models import build_super_resolution_unet
    from adunet.parallel import (
        auto_data_parallel_size,
        make_mesh,
        maybe_initialize_distributed,
        replicate,
    )
    from adunet.parallel.distributed import process_seed, process_shard
    from adunet.train import (
        CheckpointManager,
        create_train_state,
        fit,
        repeat,
        make_optimizer,
        make_sr_train_step,
        make_sr_val_step,
    )
    from adunet.utils import split_indices

    maybe_initialize_distributed()

    if cfg.high_res_dir is None:
        raise ValueError("--high_res_dir is required (no cluster default paths in this build).")

    hr_paths = find_images(cfg.high_res_dir, cfg.image_suffix, cfg.limit)

    train_split = 1.0 - (cfg.val_split + cfg.test_split)
    train_idx, val_idx, test_idx = split_indices(
        len(hr_paths), train_split, cfg.val_split, cfg.test_split, cfg.seed
    )
    train_paths = [hr_paths[i] for i in train_idx]
    val_paths = [hr_paths[i] for i in val_idx]
    test_paths = [hr_paths[i] for i in test_idx]
    # multi-host: each process streams a DIFFERENT slice of the training data
    # (shard_batch assembles the global batch from per-process local batches).
    # process_shard guarantees equal shard lengths, so the steps_per_epoch
    # derived below is identical on every process (collective lockstep).
    global_train_paths = train_paths
    train_paths = process_shard(train_paths, seed=cfg.seed)
    data_seed = process_seed(cfg.seed)

    degrade_scale = cfg.train_degrade_scale()
    paired = bool(cfg.low_res_dir)
    if paired:
        # Real-LR data path (reference train_adaptive_unet.py:123-197): whole
        # images AREA-resized to patch_size, paired with same-named LR files.
        from adunet.data import ArrayDataset, load_rgb_image, pair_lr_files

        lr_paths_all = pair_lr_files(hr_paths, cfg.low_res_dir)

        def paired_dataset(idx, shuffle: bool, drop_remainder: bool):
            if not len(idx):
                return None
            hr_stack = np.stack([load_rgb_image(hr_paths[i], cfg.patch_size) for i in idx])
            lr_stack = np.stack([load_rgb_image(lr_paths_all[i], cfg.patch_size) for i in idx])
            return ArrayDataset(
                lr_stack, hr_stack, batch_size=cfg.batch_size,
                shuffle=shuffle, seed=cfg.seed, drop_remainder=drop_remainder,
            )

        train_ds = paired_dataset(
            process_shard(list(train_idx), seed=cfg.seed),
            shuffle=True, drop_remainder=True,
        )
        if train_ds is None:
            raise ValueError("Paired mode requires at least one training image.")
        train_patch_count = len(train_idx)
        steps_per_epoch = train_ds.steps_per_epoch
        val_ds = paired_dataset(val_idx, shuffle=False, drop_remainder=False)
        val_patch_count, test_patch_count = len(val_idx), len(test_idx)
    else:
        train_ds, train_patch_count = make_training_patch_dataset(
            train_paths,
            patch_size=cfg.patch_size,
            patches_per_image=cfg.patches_per_image,
            scale=degrade_scale,
            batch_size=cfg.batch_size,
            seed=data_seed,
            shuffle_buffer=cfg.shuffle_buffer,
            output_dtype="uint8" if cfg.uint8_feed else "float32",
            cache_decoded=cfg.cache_decoded,
        )
        steps_per_epoch = math.ceil(train_patch_count / cfg.batch_size)

        val_ds = None
        val_patch_count = 0
        if val_paths:
            val_ds, val_patch_count, _ = make_eval_patch_dataset(
                val_paths,
                patch_size=cfg.patch_size,
                scale=degrade_scale,
                batch_size=cfg.batch_size,
                stride=cfg.eval_stride,
            )
        # census only — counted from image headers, no decode
        from adunet.data import grid_patch_count, read_image_size

        test_patch_count = 0
        for p in test_paths:
            h, w = read_image_size(p)
            test_patch_count += grid_patch_count(
                h, w, cfg.patch_size, stride=cfg.eval_stride or cfg.patch_size
            )

    dtype = jnp.bfloat16 if cfg.mixed_precision else jnp.float32
    model, info = build_super_resolution_unet(
        scale=cfg.scale,
        base_channels=cfg.base_channels,
        residual_head_channels=cfg.residual_head_channels,
        depth_override=cfg.depth_override,
        input_size=cfg.patch_size,
        max_depth=cfg.max_depth,
        dtype=dtype,
        remat=cfg.remat,
        remat_levels=cfg.remat_levels,
    )

    perceptual_fn = None
    if cfg.loss == "combined":
        perceptual_fn = make_perceptual_fn(
            weights_path=cfg.vgg19_npz, input_size=cfg.patch_size, dtype=dtype
        )
    loss_fn, _metrics = build_losses_and_metrics(cfg.loss, perceptual_fn=perceptual_fn)

    # Batch-vs-mesh policy: with no explicit --n_devices (single-process,
    # no model sharding), cap the data axis at the largest divisor of the
    # micro-batch that fits the slice — the reference's own sweep tables go
    # down to batch 1-2 (run_experiment_adaptive_depth.sh:47-55) and must
    # still train on an 8-chip host. Explicit --n_devices keeps the hard
    # divisibility guard: a stated request should fail loudly, not shrink.
    accum = getattr(cfg, "grad_accum", 1) or 1
    n_devices = cfg.n_devices
    if (
        n_devices is None
        and cfg.model_shards <= 1
        and jax.process_count() == 1
    ):
        avail = jax.device_count()
        n_devices = auto_data_parallel_size(cfg.batch_size, avail, micro_factor=accum)
        if n_devices < avail:
            print(
                f"[mesh] data axis auto-capped to {n_devices} of {avail} devices "
                f"(batch_size={cfg.batch_size}, grad_accum={accum}).",
                flush=True,
            )
    if cfg.model_shards > 1:
        from adunet.parallel import make_dp_model_mesh, shard_state

        mesh = make_dp_model_mesh(cfg.model_shards, n_devices)
    else:
        mesh = make_mesh(n_devices)
    n_dev = int(np.prod(mesh.devices.shape))
    dp_size = mesh.shape["data"]
    # batch_size is per-process: the global batch (batch_size x process_count)
    # must split evenly over the data axis
    local_dp = max(1, dp_size // jax.process_count())
    if cfg.batch_size % local_dp != 0:
        raise ValueError(
            f"batch_size={cfg.batch_size} must be divisible by the per-process data-axis "
            f"share ({local_dp}); pass --n_devices/--model_shards or adjust --batch_size."
        )
    if accum > 1:
        if cfg.batch_size % (accum * local_dp) != 0:
            raise ValueError(
                f"batch_size={cfg.batch_size} must be divisible by "
                f"grad_accum x per-process data share ({accum} x {local_dp})."
            )

    sample = jnp.zeros((cfg.batch_size, cfg.patch_size, cfg.patch_size, 3), jnp.float32)
    state = create_train_state(model, jax.random.key(cfg.seed), sample[:1], make_optimizer(cfg.learning_rate))
    def place(st):
        if cfg.model_shards > 1:
            return shard_state(st, mesh)
        return replicate(st, mesh)

    state = place(state)

    # params summary (model_summary.txt equivalent)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(state.params))

    timestamp = datetime.now().strftime("%Y%m%d-%H%M%S")
    inferred = f"scale{cfg.scale:.2f}_bs{cfg.batch_size}_lr{cfg.learning_rate:.0e}_{timestamp}"
    run_name = cfg.run_name or inferred
    run_dir = Path(cfg.log_dir).expanduser() / run_name
    run_dir.mkdir(parents=True, exist_ok=True)
    model_dir = Path(cfg.model_dir).expanduser()
    model_dir.mkdir(parents=True, exist_ok=True)
    ckpt_dir = model_dir / f"unet_adaptive_scale{cfg.scale:.2f}_depth{info['depth']}"

    config_payload = {
        **dataclasses.asdict(cfg),
        "depth": info["depth"],
        "bottleneck_size": info["bottleneck_size"],
        "n_params": n_params,
        "n_devices": n_dev,
        "train_images": len(train_paths),
        "val_images": len(val_paths),
        "test_images": len(test_paths),
        "train_patches_per_epoch": int(train_patch_count),
        "steps_per_epoch": int(steps_per_epoch),
        "low_res_mode": "paired_directory" if paired else "synthetic_patches",
        "created_at": timestamp,
    }
    # host-side run artifacts are process-0-only on multi-host (every process
    # sees the same run_dir on a shared FS — concurrent writers clobber);
    # Orbax checkpoint saves stay on ALL processes (distributed save protocol)
    from adunet.parallel.distributed import is_main_process

    main = is_main_process()
    if main:
        (run_dir / "config.json").write_text(json.dumps(config_payload, indent=2, default=str))
        try:
            from flax import linen as nn

            table = nn.tabulate(model, jax.random.key(0), compute_flops=False)(sample[:1])
        except Exception:
            table = repr(model)
        (run_dir / "model_summary.txt").write_text(
            f"{table}\nTotal params: {n_params:,}\ndepth: {info['depth']}\n"
            f"bottleneck: {info['bottleneck_size']}px\n"
        )
    print(f"Model: depth={info['depth']} params={n_params:,} devices={n_dev}")

    ckpt = CheckpointManager(
        ckpt_dir, monitor="val_loss", mode="min", async_save=cfg.async_checkpoint
    )
    # capture any pre-existing run config BEFORE overwriting it — the
    # auto-resume cross-check below compares against what the checkpoints
    # were actually trained with
    stored_cfg = {}
    if (ckpt_dir / "config.json").exists():
        try:
            stored_cfg = json.loads((ckpt_dir / "config.json").read_text())
        except Exception:
            stored_cfg = {}
    if main:
        ckpt.write_config(config_payload)

    initial_epoch = cfg.initial_epoch
    if cfg.resume_from:
        resume_mngr = CheckpointManager(Path(cfg.resume_from).expanduser(), monitor="val_loss", mode="min")
        restored = resume_mngr.restore_latest(state)
        if restored is None:
            raise FileNotFoundError(f"--resume_from {cfg.resume_from} contains no checkpoints.")
        state = place(restored)
        last_step = resume_mngr.latest_step() or 0
        if initial_epoch == 0:
            initial_epoch = int(last_step)
            print(f"[info] resuming from epoch {initial_epoch} (checkpoint step).")
    elif ckpt.latest_step() is not None:
        # BackupAndRestore semantics (reference train_adaptive_unet.py:613-620):
        # a crashed/preempted run restarted with the same dirs auto-resumes.
        # Cross-check the stored run config first: silently adopting
        # checkpoints trained under different data/model flags corrupts the
        # run (same warn-don't-fail posture as the reference's --resume_from
        # cross-checks, train_adaptive_unet.py:496-522).
        drift = {
            key: (stored_cfg.get(key), config_payload.get(key))
            for key in ("scale", "depth_override", "max_depth", "base_channels",
                        "patch_size", "patches_per_image", "batch_size", "seed",
                        "loss", "data_lr_shrink", "consistent_degradation",
                        "high_res_dir", "low_res_dir")
            if key in stored_cfg and stored_cfg.get(key) != config_payload.get(key)
        }
        if drift:
            print("[warn] auto-resume checkpoints were trained under DIFFERENT "
                  "flags; continuing mixes training regimes: "
                  + ", ".join(f"{k}: {old!r} -> {new!r}" for k, (old, new) in sorted(drift.items())))
        restored = ckpt.restore_latest(state)
        state = place(restored)
        initial_epoch = int(ckpt.latest_step())
        print(f"[info] auto-resume from existing checkpoints at epoch {initial_epoch}.")
    elif initial_epoch > 0:
        print("[warn] --initial_epoch was set without --resume_from; training will skip "
              "the initial epochs but start from random weights.")

    try:
        from tensorboardX import SummaryWriter

        tb_writer = SummaryWriter(str(run_dir)) if main else None
    except Exception:
        tb_writer = None

    if tb_writer is not None:
        # step-0 observability parity (reference train_adaptive_unet.py:573-598):
        # hyperparameter text, dataset census scalars, preview image grids +
        # histograms of the exact (hr, lr) pairs the model will see.
        tb_writer.add_text(
            "config/hyperparameters",
            "```json\n" + json.dumps(config_payload, indent=2, default=str) + "\n```",
            0,
        )
        tb_writer.add_text("model/summary", "```\n" + table + "\n```", 0)
        tb_writer.add_scalar("dataset/images/train", len(train_paths), 0)
        tb_writer.add_scalar("dataset/images/val", len(val_paths), 0)
        tb_writer.add_scalar("dataset/images/test", len(test_paths), 0)
        tb_writer.add_scalar("dataset/patches_per_epoch/train", int(train_patch_count), 0)
        tb_writer.add_scalar("dataset/patches/val", int(val_patch_count), 0)
        tb_writer.add_scalar("dataset/patches/test", int(test_patch_count), 0)

        preview_count = min(cfg.preview_patches, len(train_paths))
        if preview_count > 0:
            from adunet.data import load_rgb_image_full, random_patches
            from adunet.ops import degrade as _degrade

            rng_np = np.random.default_rng(cfg.seed)
            if paired:
                lr_b, hr_b = next(iter(paired_dataset(train_idx[:preview_count],
                                                      shuffle=False, drop_remainder=False)))
                hr_preview, lr_preview = hr_b, lr_b
            else:
                first = load_rgb_image_full(train_paths[0])
                hr_preview = random_patches(first, cfg.patch_size, count=preview_count, rng=rng_np)
                lr_preview = np.asarray(
                    jax.jit(lambda h: _degrade(h, degrade_scale, cfg.patch_size))(
                        jnp.asarray(hr_preview)
                    )
                )
            hr01 = np.clip(hr_preview, 0.0, 1.0)
            lr01 = np.clip(lr_preview, 0.0, 1.0)
            tb_writer.add_images("samples/hr_train", hr01, 0, dataformats="NHWC")
            tb_writer.add_images("samples/lr_train", lr01, 0, dataformats="NHWC")
            tb_writer.add_histogram("hist/hr_train", hr01.reshape(-1), 0)
            tb_writer.add_histogram("hist/lr_train", lr01.reshape(-1), 0)

    samples_per_step = None
    if cfg.device_cache and not paired:
        # whole corpus -> HBM as uint8; the step samples its own patches so
        # the host only streams PRNG keys (zero per-step transfer)
        from adunet.data import load_device_cache
        from adunet.parallel import batch_sharding as _batch_sharding, replicated_sharding
        from adunet.train import make_sr_device_cache_train_step

        # the cache is declared replicated over the global mesh, so every
        # process must contribute the IDENTICAL global corpus (the jitted
        # step samples one global batch from it; GSPMD shards the batch) —
        # the process-sharded list would put different pixels on each host
        cache = load_device_cache(global_train_paths, sharding=replicated_sharding(mesh))
        print(f"[device_cache] {cache.shape[0]} images "
              f"({cache.nbytes / 1e6:.0f} MB uint8) resident in HBM.")
        # batch_size is PER-PROCESS everywhere (streaming mode assembles a
        # global batch of batch_size x process_count); the cache step samples
        # its batch globally inside the program, so it must sample the same
        # global size or multi-host runs would quietly train at 1/P batch
        global_batch = cfg.batch_size * jax.process_count()
        accum = getattr(cfg, "grad_accum", 1) or 1
        train_step = make_sr_device_cache_train_step(
            model, loss_fn, cache,
            patch_size=cfg.patch_size, batch_size=global_batch,
            data_scale=degrade_scale,
            batch_sharding=_batch_sharding(mesh),
            grad_accum=accum,
        )
        samples_per_step = cfg.batch_size  # per-process accounting, as streaming

        def train_feed():
            while True:
                yield None  # rng is the data source (None passes fit() untouched)

        train_iter = train_feed()
    else:
        from adunet.parallel import batch_sharding as _bs

        accum = getattr(cfg, "grad_accum", 1) or 1
        train_step = make_sr_train_step(
            model, loss_fn, data_scale=degrade_scale,
            grad_accum=accum,
            batch_sharding=_bs(mesh) if (accum > 1 and mesh is not None) else None,
        )

        train_iter = repeat(train_ds) if paired else train_ds
    # per-sample val metrics: on a single-process mesh fit() pads + SHARDS
    # ragged val batches on 'data' and masks padding (VERDICT r2 #3)
    val_step = make_sr_val_step(model, loss_fn, data_scale=degrade_scale,
                                per_sample=True)

    result = fit(
        state,
        train_iter,
        train_step,
        steps_per_epoch=steps_per_epoch,
        epochs=cfg.epochs,
        initial_epoch=initial_epoch,
        rng=jax.random.key(cfg.seed),
        val_data=val_ds,
        val_step=val_step,
        monitor="val_loss",
        monitor_mode="min",
        patience=cfg.patience,
        restore_best_weights=True,
        ckpt=ckpt,
        ckpt_every=cfg.ckpt_every,
        mesh=mesh,
        log_dir=run_dir if main else None,
        tb_writer=tb_writer,
        samples_per_step=samples_per_step,
        profile_dir=(run_dir / "profile") if cfg.profile else None,
        val_per_sample=True,
    )
    state = result.state
    print("Training complete.")
    print(f"Model info: {info}")
    print(f"Checkpoints at: {ckpt_dir}")

    # post-training Y-channel eval (reference :673-721)
    eval_shave = infer_eval_shave(cfg.scale, cfg.eval_shave)
    if eval_shave * 2 >= cfg.patch_size and cfg.patch_size > 0:
        adjusted = max(0, (cfg.patch_size // 2) - 1)
        print(f"[warn] eval_shave={eval_shave} removes the full frame; reducing to {adjusted}.")
        eval_shave = adjusted

    from adunet.evaluate import evaluate_sr

    final_metrics = {}
    for name, paths, idx in (("Validation", val_paths, val_idx), ("Test", test_paths, test_idx)):
        if not paths:
            continue
        if paired:
            ds = paired_dataset(idx, shuffle=False, drop_remainder=False)
        else:
            ds, _, _labels = make_eval_patch_dataset(
                paths,
                patch_size=cfg.patch_size,
                scale=degrade_scale,
                batch_size=cfg.batch_size,
                stride=cfg.eval_stride,
            )
        summary, _rows = evaluate_sr(
            state, ds, eval_scale=degrade_scale, eval_shave=eval_shave,
            # sharded eval: each chip scores 1/N of the patches
            mesh=mesh if jax.process_count() == 1 else None,
        )
        print(f"{name} patches evaluated: {summary.samples}")
        print(f"  MSE(Y)     : {summary.mse_mean:.6f} +/- {summary.mse_std:.6f}")
        print(f"  PSNR(Y)    : {summary.psnr_mean:.4f} +/- {summary.psnr_std:.4f} dB")
        print(f"  SSIM(Y)    : {summary.ssim_mean:.4f} +/- {summary.ssim_std:.4f}")
        print(f"  MS-SSIM(Y) : {summary.msssim_mean:.4f} +/- {summary.msssim_std:.4f}")
        final_metrics[name.lower()] = dataclasses.asdict(summary)
        if tb_writer is not None:
            prefix = name.lower()
            step = len(result.history)
            tb_writer.add_scalar(f"eval/{prefix}_mse_y", summary.mse_mean, step)
            tb_writer.add_scalar(f"eval/{prefix}_psnr_y", summary.psnr_mean, step)
            tb_writer.add_scalar(f"eval/{prefix}_ssim_y", summary.ssim_mean, step)
            tb_writer.add_scalar(f"eval/{prefix}_msssim_y", summary.msssim_mean, step)

    if tb_writer is not None:
        tb_writer.close()
    ckpt.close()
    return {"run_dir": str(run_dir), "ckpt_dir": str(ckpt_dir), "eval": final_metrics,
            "history_epochs": len(result.history), "best_epoch": result.best_epoch}


def main(argv: Optional[List[str]] = None) -> None:
    from adunet.utils.runtime import setup_runtime

    setup_runtime()
    args = parse_args(argv)
    cfg = config_from_args(args)
    train(cfg)


if __name__ == "__main__":
    main()
