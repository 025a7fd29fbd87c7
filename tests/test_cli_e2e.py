"""End-to-end CLI tests: train_sr then evaluate on a synthetic tiny dataset.

Mirrors the reference lifecycle (SURVEY.md §3.4): train → auto-eval →
offline evaluator report, all on the 8-device CPU mesh with npy 'images'.
"""

import json
from pathlib import Path

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("div2k_tiny")
    rng = np.random.default_rng(0)
    for i in range(8):
        coarse = rng.random((12, 12, 3), dtype=np.float32)
        img = np.clip(np.repeat(np.repeat(coarse, 4, 0), 4, 1), 0, 1)  # 48x48 smooth
        np.save(root / f"img{i}.npy", img.astype(np.float32))
    return root


def test_train_and_evaluate_cli(tiny_dataset, tmp_path):
    from adunet.cli.train_sr import main as train_main
    from adunet.cli.evaluate import main as eval_main

    model_dir = tmp_path / "models"
    log_dir = tmp_path / "logs"
    train_main([
        "--scale", "0.5",
        "--depth_override", "1",
        "--base_channels", "8",
        "--residual_head_channels", "8",
        "--patch_size", "32",
        "--patches_per_image", "2",
        "--batch_size", "8",
        "--epochs", "2",
        "--patience", "5",
        "--high_res_dir", str(tiny_dataset),
        "--image_suffix", ".npy",
        "--model_dir", str(model_dir),
        "--log_dir", str(log_dir),
        "--run_name", "e2e",
        "--seed", "7",
    ])

    run_dir = log_dir / "e2e"
    assert (run_dir / "config.json").exists()
    assert (run_dir / "model_summary.txt").exists()
    assert (run_dir / "epoch_metrics.csv").exists()
    cfg = json.loads((run_dir / "config.json").read_text())
    assert cfg["depth"] == 1
    rows = (run_dir / "epoch_metrics.csv").read_text().strip().splitlines()
    assert len(rows) == 3  # header + 2 epochs

    # TensorBoard observability parity (reference train_adaptive_unet.py:573-598):
    # hyperparameter text, dataset census, step-0 preview images + histograms
    event_files = list(run_dir.glob("events.out.tfevents.*"))
    assert event_files, "no TensorBoard event file written"
    blob = b"".join(f.read_bytes() for f in event_files)
    for tag in (b"config/hyperparameters", b"model/summary",
                b"dataset/images/train", b"dataset/patches_per_epoch/train",
                b"samples/hr_train", b"samples/lr_train",
                b"hist/hr_train", b"hist/lr_train"):
        assert tag in blob, f"missing TB tag {tag!r}"

    ckpt_dirs = list(model_dir.glob("unet_adaptive_scale0.50_depth1"))
    assert ckpt_dirs, f"no checkpoint dir in {list(model_dir.iterdir())}"

    out_dir = tmp_path / "eval"
    eval_main([
        "--model-path", str(ckpt_dirs[0]),
        "--scale", "0.5",
        "--hr-dir", str(tiny_dataset),
        "--image-suffix", ".npy",
        "--patch-size", "32",
        "--batch-size", "4",
        "--eval-shave", "2",
        "--output-dir", str(out_dir),
        "--run-name", "report",
    ])
    report = out_dir / "report"
    metrics = json.loads((report / "metrics.json").read_text())
    assert metrics["samples"] == 8  # 8 images x 1 patch (48px, stride 32 -> 1)
    assert np.isfinite(metrics["psnr_mean"])
    per_image = (report / "per_image_metrics.csv").read_text().strip().splitlines()
    assert per_image[0] == "index,filename,psnr_y,ssim_y,msssim_y,mse_y"
    assert len(per_image) == 9


@pytest.fixture(scope="module")
def tiny_isic(tmp_path_factory):
    root = tmp_path_factory.mktemp("isic_tiny")
    (root / "train_img").mkdir(); (root / "train_mask").mkdir()
    (root / "val_img").mkdir(); (root / "val_mask").mkdir()
    rng = np.random.default_rng(1)
    for split, n in (("train", 8), ("val", 4)):
        for i in range(n):
            img = rng.random((32, 32, 3), dtype=np.float32)
            mask = np.zeros((32, 32), np.float32)
            mask[8:24, 8:24] = 1.0
            np.save(root / f"{split}_img" / f"isic_{split}{i:04d}.npy", img)
            np.save(root / f"{split}_mask" / f"isic_{split}{i:04d}_segmentation.npy", mask)
    return root


def test_train_seg_cli(tiny_isic, tmp_path):
    from adunet.cli.train_seg import main as seg_main

    seg_main([
        "--protocol", "A",
        "--epochs", "2",
        "--batch_size", "8",
        "--base_channels", "8",
        "--depth", "2",
        "--image_size", "32",
        "--train_images", str(tiny_isic / "train_img"),
        "--train_masks", str(tiny_isic / "train_mask"),
        "--val_images", str(tiny_isic / "val_img"),
        "--val_masks", str(tiny_isic / "val_mask"),
        "--model_dir", str(tmp_path / "models"),
        "--log_dir", str(tmp_path / "logs"),
        "--run_name", "seg_e2e",
    ])
    run_dir = tmp_path / "logs" / "seg_e2e"
    cfg = json.loads((run_dir / "config.json").read_text())
    assert cfg["protocol"] == "A"
    assert "dice" in cfg["metrics"] and 0 <= cfg["metrics"]["dice"] <= 1
    assert (run_dir / "epoch_metrics.csv").exists()


def test_train_seg_vanilla_cli(tiny_isic, tmp_path):
    from adunet.cli.train_seg_vanilla import main as vanilla_main

    vanilla_main([
        "--train_image_dir", str(tiny_isic / "train_img"),
        "--train_mask_dir", str(tiny_isic / "train_mask"),
        "--val_image_dir", str(tiny_isic / "val_img"),
        "--val_mask_dir", str(tiny_isic / "val_mask"),
        "--image_suffix", ".npy",
        "--mask_suffix", "_segmentation.npy",
        "--image_size", "32",
        "--batch_size", "8",
        "--epochs", "2",
        "--base_channels", "4",
        "--depth", "2",
        "--augment",
        "--model_dir", str(tmp_path / "models"),
        "--log_dir", str(tmp_path / "logs"),
        "--run_name", "vanilla_e2e",
    ])
    run_dirs = list((tmp_path / "logs").glob("vanilla_e2e_*"))
    assert run_dirs
    cfg = json.loads((run_dirs[0] / "config.json").read_text())
    assert cfg["best_val_dice"] is not None
    # epoch CSV has the vanilla metric columns
    header = (run_dirs[0] / "epoch_metrics.csv").read_text().splitlines()[0]
    for col in ("accuracy", "precision", "recall", "dice_coefficient"):
        assert col in header


def test_train_sr_vanilla_cli(tmp_path):
    from adunet.cli.train_sr_vanilla import main as vsr_main

    rng = np.random.default_rng(3)
    hr_dir = tmp_path / "hr"; lr_dir = tmp_path / "lr"
    hr_dir.mkdir(); lr_dir.mkdir()
    for i in range(8):
        img = rng.random((32, 32, 3), dtype=np.float32)
        np.save(hr_dir / f"im{i}.npy", img)
        np.save(lr_dir / f"im{i}.npy", np.clip(img + 0.05, 0, 1))

    vsr_main([
        "--high_res_dir", str(hr_dir),
        "--low_res_dir", str(lr_dir),
        "--hr_size", "32",
        "--batch_size", "4",
        "--epochs", "2",
        "--base_channels", "4",
        "--loss", "charbonnier",
        "--model_dir", str(tmp_path / "models"),
        "--log_dir", str(tmp_path / "logs"),
        "--run_name", "vsr_e2e",
        "--n_devices", "4",
    ])
    cfg = json.loads((tmp_path / "logs" / "vsr_e2e" / "config.json").read_text())
    assert "validation" in cfg["results"]
    assert cfg["results"]["validation"]["psnr"][0] > 0


def test_inspect_cli(tiny_dataset, tmp_path):
    """Reuses the SR e2e checkpoint flow on a fresh tiny train, then renders grids."""
    from adunet.cli.train_sr import main as train_main
    from adunet.cli.inspect import main as inspect_main

    model_dir = tmp_path / "models"
    train_main([
        "--scale", "0.5", "--depth_override", "1",
        "--base_channels", "8", "--residual_head_channels", "8",
        "--patch_size", "32", "--patches_per_image", "1",
        "--batch_size", "8", "--epochs", "1", "--patience", "2",
        "--high_res_dir", str(tiny_dataset), "--image_suffix", ".npy",
        "--model_dir", str(model_dir), "--log_dir", str(tmp_path / "logs"),
        "--run_name", "insp",
    ])
    ckpt = model_dir / "unet_adaptive_scale0.50_depth1"
    out = tmp_path / "grids"
    inspect_main([
        "--model-path", str(ckpt),
        "--scale", "0.5",
        "--hr-dir", str(tiny_dataset),
        "--image-suffix", ".npy",
        "--patch-size", "32",
        "--n-examples", "2",
        "--output-dir", str(out),
    ])
    assert list(out.glob("*.png"))


def test_train_sr_resume(tiny_dataset, tmp_path):
    """Resume semantics: second run restores from the Orbax checkpoint and
    continues at the stored epoch (reference --resume_from/--initial_epoch,
    train_adaptive_unet.py:496-522)."""
    from adunet.cli.train_sr import main as train_main

    common = [
        "--scale", "0.5", "--depth_override", "1",
        "--base_channels", "8", "--residual_head_channels", "8",
        "--patch_size", "32", "--patches_per_image", "1",
        "--batch_size", "8", "--patience", "10",
        "--high_res_dir", str(tiny_dataset), "--image_suffix", ".npy",
        "--model_dir", str(tmp_path / "models"),
        "--log_dir", str(tmp_path / "logs"),
    ]
    train_main(common + ["--epochs", "2", "--run_name", "part1"])
    ckpt = tmp_path / "models" / "unet_adaptive_scale0.50_depth1"
    assert ckpt.exists()

    train_main(common + [
        "--epochs", "4", "--run_name", "part2",
        "--resume_from", str(ckpt),
    ])
    rows = (tmp_path / "logs" / "part2" / "epoch_metrics.csv").read_text().strip().splitlines()
    # resumed at epoch 3 and 4 -> exactly 2 data rows, first labelled epoch 3
    assert len(rows) == 3
    assert rows[1].split(",")[0] == "3"


def test_train_sr_paired_lr_dir(tmp_path):
    """--low_res_dir trains on real LR pixels paired by filename (reference
    build_dataset alt path, train_adaptive_unet.py:123-197)."""
    from adunet.cli.train_sr import main as train_main

    rng = np.random.default_rng(3)
    hr_dir = tmp_path / "hr"
    lr_dir = tmp_path / "lr"
    hr_dir.mkdir()
    lr_dir.mkdir()
    for i in range(16):
        hr = rng.random((32, 32, 3), dtype=np.float32)
        blur = hr.reshape(16, 2, 16, 2, 3).mean(axis=(1, 3))
        lr = np.clip(np.repeat(np.repeat(blur, 2, 0), 2, 1), 0, 1)
        np.save(hr_dir / f"im{i}.npy", hr)
        np.save(lr_dir / f"im{i}.npy", lr.astype(np.float32))

    log_dir = tmp_path / "logs"
    train_main([
        "--scale", "0.5", "--depth_override", "1",
        "--base_channels", "8", "--residual_head_channels", "8",
        "--patch_size", "32", "--batch_size", "8",
        "--epochs", "2", "--patience", "5",
        "--high_res_dir", str(hr_dir), "--low_res_dir", str(lr_dir),
        "--image_suffix", ".npy",
        "--model_dir", str(tmp_path / "models"), "--log_dir", str(log_dir),
        "--run_name", "paired", "--seed", "11",
    ])
    cfg = json.loads((log_dir / "paired" / "config.json").read_text())
    assert cfg["low_res_mode"] == "paired_directory"
    rows = (log_dir / "paired" / "epoch_metrics.csv").read_text().strip().splitlines()
    assert len(rows) == 3  # header + 2 epochs


def test_restore_cli(tiny_dataset, tmp_path):
    """Batch restoration: tile->predict->stitch over arbitrary-size inputs
    (capability the reference never shipped — run a trained model on images)."""
    from adunet.cli.restore import main as restore_main, _tile_starts, _blend_weights
    from adunet.cli.train_sr import main as train_main

    train_main([
        "--scale", "0.5", "--depth_override", "1",
        "--base_channels", "8", "--residual_head_channels", "8",
        "--patch_size", "32", "--patches_per_image", "1",
        "--batch_size", "8", "--epochs", "1", "--patience", "5",
        "--high_res_dir", str(tiny_dataset), "--image_suffix", ".npy",
        "--model_dir", str(tmp_path / "models"), "--log_dir", str(tmp_path / "logs"),
        "--run_name", "restore_src",
    ])

    # tiling math: full cover, right-aligned tail, overlap respected
    assert _tile_starts(48, 32, 8) == [0, 16]
    assert _tile_starts(32, 32, 8) == [0]
    assert _tile_starts(100, 32, 8) == [0, 24, 48, 68]
    w = _blend_weights(32, 8)
    assert w.shape == (32, 32) and w.max() <= 1.0 and w.min() > 0.0

    out_dir = tmp_path / "restored"
    restore_main([
        "--model-path", str(tmp_path / "models" / "unet_adaptive_scale0.50_depth1"),
        "--scale", "0.5",
        "--input-dir", str(tiny_dataset),
        "--image-suffix", ".npy",
        "--patch-size", "32", "--overlap", "8", "--batch-size", "4",
        "--output-dir", str(out_dir),
        "--limit", "2",
    ])
    outputs = sorted(out_dir.iterdir())
    assert len(outputs) == 2
    # zero-init-head model => restored output ~= degraded input, finite, in range
    arr = (np.asarray(__import__("cv2").imread(str(outputs[0]))[..., ::-1], np.float32) / 255.0
           if outputs[0].suffix == ".png" else np.load(outputs[0]))
    assert arr.shape == (48, 48, 3)
    assert np.isfinite(arr).all() and 0.0 <= arr.min() and arr.max() <= 1.0


def test_train_sr_device_cache(tiny_dataset, tmp_path):
    """--device_cache: corpus resident in HBM, patches sampled inside the
    jitted step (zero per-step host transfer), full train->eval flow."""
    from adunet.cli.train_sr import main as train_main

    log_dir = tmp_path / "logs"
    train_main([
        "--scale", "0.5", "--depth_override", "1",
        "--base_channels", "8", "--residual_head_channels", "8",
        "--patch_size", "32", "--patches_per_image", "2",
        "--batch_size", "16", "--epochs", "2", "--patience", "5",
        "--high_res_dir", str(tiny_dataset), "--image_suffix", ".npy",
        "--model_dir", str(tmp_path / "models"), "--log_dir", str(log_dir),
        "--run_name", "devcache", "--seed", "7",
        "--device_cache", "--grad_accum", "2",
    ])
    rows = (log_dir / "devcache" / "epoch_metrics.csv").read_text().strip().splitlines()
    assert len(rows) == 3
    # training actually consumed data: psnr/loss are finite numbers
    header = rows[0].split(",")
    first = dict(zip(header, rows[1].split(",")))
    assert np.isfinite(float(first["loss"])) and np.isfinite(float(first["val_loss"]))


def test_train_seg_cli_ragged_tail_on_mesh(tmp_path):
    """10 pairs at batch 8 on the 8-device mesh: the ragged tail (2) cannot
    shard over the data axis — pad_tail must wrap-fill it (this config
    crashed mid-epoch before the fix)."""
    from adunet.cli.train_seg import main as seg_main

    root = tmp_path
    for d in ("ti", "tm", "vi", "vm"):
        (root / d).mkdir()
    rng = np.random.default_rng(2)
    for split, d_img, d_mask, n in (("t", "ti", "tm", 10), ("v", "vi", "vm", 8)):
        for i in range(n):
            np.save(root / d_img / f"isic_{split}{i:03d}.npy",
                    rng.random((32, 32, 3), dtype=np.float32))
            m = np.zeros((32, 32), np.float32)
            m[8:24, 8:24] = 1.0
            np.save(root / d_mask / f"isic_{split}{i:03d}_segmentation.npy", m)

    result = seg_main([
        "--protocol", "A", "--epochs", "1", "--batch_size", "8",
        "--base_channels", "8", "--depth", "2", "--image_size", "32",
        "--train_images", str(root / "ti"), "--train_masks", str(root / "tm"),
        "--val_images", str(root / "vi"), "--val_masks", str(root / "vm"),
        "--model_dir", str(root / "models"), "--log_dir", str(root / "logs"),
        "--run_name", "ragged",
    ])
    cfg = json.loads((root / "logs" / "ragged" / "config.json").read_text())
    assert cfg["train_samples"] == 10
    assert cfg["train_steps_per_epoch"] == 2  # ceil(10/8), tail wrap-filled


def test_train_sr_auto_resume_warns_on_config_drift(tiny_dataset, tmp_path, capsys):
    """Auto-resume (BackupAndRestore semantics) must surface that the
    existing checkpoints were trained under DIFFERENT data/model flags —
    silently mixing training regimes corrupted a round-4 sweep run before
    this cross-check existed (same warn posture as the reference's
    --resume_from checks, train_adaptive_unet.py:496-522)."""
    from adunet.cli.train_sr import main as train_main

    def args(ppi, epochs):
        return [
            "--scale", "0.5", "--depth_override", "1",
            "--base_channels", "8", "--residual_head_channels", "8",
            "--patch_size", "32", "--patches_per_image", str(ppi),
            "--batch_size", "8", "--patience", "10",
            "--high_res_dir", str(tiny_dataset), "--image_suffix", ".npy",
            "--model_dir", str(tmp_path / "models"),
            "--log_dir", str(tmp_path / "logs"),
            "--epochs", str(epochs), "--run_name", f"drift_ppi{ppi}",
        ]

    train_main(args(ppi=1, epochs=1))
    capsys.readouterr()

    # same dirs, more epochs, CHANGED patches_per_image -> auto-resume + warn
    train_main(args(ppi=2, epochs=2))
    out = capsys.readouterr().out
    assert "auto-resume" in out
    assert "DIFFERENT" in out and "patches_per_image" in out

    # unchanged flags -> auto-resume without the drift warning
    train_main(args(ppi=2, epochs=3))
    out = capsys.readouterr().out
    assert "auto-resume" in out
    assert "DIFFERENT" not in out
