"""Vanilla fixed 4-level SR U-Net training CLI.

Rebuild of /root/reference/Super_resolution/code/u-net-vinillia.py: in-memory
HR/LR image stacks (paired directories, square-resized), classic max-pool
U-Net with sigmoid head, combined MSE+SSIM+perceptual loss, PSNR metric,
early stopping + best checkpoint, and an RGB PSNR/SSIM/MS-SSIM evaluation
pass over val/test splits.
"""

from __future__ import annotations

import argparse
import json
from datetime import datetime
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np


def parse_args(argv: Optional[List[str]] = None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(description="Train the vanilla SR U-Net baseline (TPU).")
    parser.add_argument("--high_res_dir", type=Path, required=True)
    parser.add_argument("--low_res_dir", type=Path, required=True)
    parser.add_argument("--hr_size", type=int, default=256)
    parser.add_argument("--batch_size", type=int, default=4)
    parser.add_argument("--epochs", type=int, default=100)
    parser.add_argument("--learning_rate", type=float, default=1e-4)
    parser.add_argument("--patience", type=int, default=10)
    parser.add_argument("--val_split", type=float, default=0.1)
    parser.add_argument("--test_split", type=float, default=0.1)
    parser.add_argument("--limit", type=int, default=None)
    parser.add_argument("--seed", type=int, default=1234)
    parser.add_argument("--base_channels", type=int, default=64)
    parser.add_argument("--loss", type=str, default="combined",
                        choices=["combined", "charbonnier", "l1"])
    parser.add_argument("--vgg_weights", type=str, default=None,
                        help="Optional .npz with ImageNet VGG19 weights for the perceptual term.")
    parser.add_argument("--mixed_precision", action="store_true")
    parser.add_argument("--async_checkpoint", action="store_true",
                        help="Overlap per-epoch checkpoint writes with compute (Orbax async).")
    parser.add_argument("--model_dir", type=Path, default=Path("runs/models"))
    parser.add_argument("--log_dir", type=Path, default=Path("runs/logs"))
    parser.add_argument("--run_name", type=str, default=None)
    parser.add_argument("--n_devices", type=int, default=None)
    return parser.parse_args(argv)


def evaluate(state, dataset, eval_step) -> Dict[str, Tuple[float, float]]:
    """RGB-domain PSNR/SSIM/MS-SSIM mean±std (u-net-vinillia.py:209-241)."""
    import jax.numpy as jnp

    acc = {"psnr": [], "ssim": [], "ms_ssim": []}
    for lr_batch, hr_batch in dataset:
        out = eval_step(state, (jnp.asarray(lr_batch), jnp.asarray(hr_batch)))
        for k in acc:
            acc[k].append(np.asarray(out[k]))
    if not acc["psnr"]:
        return {}

    def mean_std(chunks):
        arr = np.concatenate(chunks, axis=0).astype(np.float64)
        return float(np.mean(arr)), float(np.std(arr))

    return {k: mean_std(v) for k, v in acc.items()}


def train(args: argparse.Namespace) -> dict:
    import jax
    import jax.numpy as jnp

    from adunet.data import load_image_stack, make_array_dataset
    from adunet.losses import build_losses_and_metrics, make_perceptual_fn
    from adunet.metrics import psnr as psnr_vec, ssim as ssim_vec, ssim_multiscale
    from adunet.models import VanillaSRUNet
    from adunet.parallel import make_mesh, replicate
    from adunet.train import CheckpointManager, create_train_state, fit, make_optimizer, repeat
    from adunet.train.state import TrainState
    from adunet.utils import split_indices

    hr_images = load_image_stack(args.high_res_dir.expanduser(), args.hr_size, limit=args.limit)
    lr_images = load_image_stack(args.low_res_dir.expanduser(), args.hr_size, limit=args.limit)
    if hr_images.shape != lr_images.shape:
        raise ValueError("HR and LR stacks differ in length; need one LR per HR image.")

    train_split = 1.0 - (args.val_split + args.test_split)
    tr_idx, va_idx, te_idx = split_indices(
        hr_images.shape[0], train_split, args.val_split, args.test_split, args.seed
    )
    from adunet.data import ArrayDataset

    train_ds = ArrayDataset(
        lr_images[np.asarray(tr_idx)], hr_images[np.asarray(tr_idx)],
        batch_size=args.batch_size, shuffle=True, seed=args.seed, drop_remainder=True,
    )
    val_ds = make_array_dataset(lr_images, hr_images, va_idx, args.batch_size, False, args.seed)
    test_ds = make_array_dataset(lr_images, hr_images, te_idx, args.batch_size, False, args.seed)

    dtype = jnp.bfloat16 if args.mixed_precision else jnp.float32
    model = VanillaSRUNet(base_channels=args.base_channels, dtype=dtype)

    perceptual_fn = None
    if args.loss == "combined":
        perceptual_fn = make_perceptual_fn(args.vgg_weights, input_size=args.hr_size, dtype=dtype)
    loss_fn, _ = build_losses_and_metrics(args.loss, perceptual_fn=perceptual_fn)

    mesh = make_mesh(args.n_devices)
    sample = jnp.zeros((1, args.hr_size, args.hr_size, 3), jnp.float32)
    state = create_train_state(model, jax.random.key(args.seed), sample, make_optimizer(args.learning_rate))
    state = replicate(state, mesh)

    import functools

    from adunet.train import make_vanilla_sr_train_step, make_vanilla_sr_val_step

    # shared steps (train/sr.py) — the same BatchNorm-mutable closure the
    # tuner consumes; an inline copy here had already started to drift
    train_step = make_vanilla_sr_train_step(model, loss_fn)
    val_step = make_vanilla_sr_val_step(model, loss_fn, per_sample=True)

    @functools.partial(jax.jit)
    def eval_step(state: TrainState, batch):
        lr_batch, hr_batch = batch
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        pred = state.apply_fn(variables, lr_batch, train=False)
        pred = jnp.clip(pred.astype(jnp.float32), 0, 1)
        hr = hr_batch.astype(jnp.float32)
        from adunet.metrics.psnr_ssim import msssim_power_factors_for

        pf = msssim_power_factors_for(min(hr.shape[-3], hr.shape[-2]))
        return {
            "psnr": psnr_vec(hr, pred),
            "ssim": ssim_vec(hr, pred),
            "ms_ssim": ssim_multiscale(hr, pred, power_factors=pf),
        }

    timestamp = datetime.now().strftime("%Y%m%d-%H%M%S")
    run_name = args.run_name or f"vanilla_sr_{timestamp}"
    run_dir = Path(args.log_dir).expanduser() / run_name
    run_dir.mkdir(parents=True, exist_ok=True)
    ckpt_dir = Path(args.model_dir).expanduser() / f"{run_name}_best"
    ckpt = CheckpointManager(
        ckpt_dir, monitor="val_loss", mode="min", async_save=args.async_checkpoint
    )

    steps_per_epoch = train_ds.steps_per_epoch
    from adunet.parallel.distributed import is_main_process

    _is_main = is_main_process()  # host-side artifacts are process-0-only
    result = fit(
        state,
        repeat(train_ds),
        train_step,
        steps_per_epoch=steps_per_epoch,
        epochs=args.epochs,
        val_data=val_ds,
        val_step=val_step,
        monitor="val_loss",
        monitor_mode="min",
        patience=args.patience,
        ckpt=ckpt,
        mesh=mesh,
        log_dir=run_dir if _is_main else None,
        val_per_sample=True,
    )
    state = result.state

    results = {}
    for name, ds in (("validation", val_ds), ("test", test_ds)):
        if len(ds):
            results[name] = evaluate(state, ds, eval_step)
            print(f"{name}: " + ", ".join(
                f"{k}={m:.4f}±{s:.4f}" for k, (m, s) in results[name].items()
            ))

    payload = {
        "run_name": run_name,
        "loss": args.loss,
        "epochs_ran": len(result.history),
        "best_epoch": result.best_epoch,
        "results": results,
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
