"""Batch-vs-mesh policy: small batches auto-cap the data axis.

The reference's own experiment-2 sweep tables go down to batch 2 (scale 0.7)
and batch 1 (scale 0.8) — run_experiment_adaptive_depth.sh:47-55 — sizes
that cannot shard over an 8-chip data axis. VERDICT r4 weak #2: rather than
refusing, trainers now cap the data axis at the largest divisor of the
micro-batch that fits the available devices (explicit --n_devices keeps the
hard guard). These tests run under the conftest's virtual 8-device CPU mesh.
"""

import json

import numpy as np
import pytest

from adunet.parallel import auto_data_parallel_size


def test_auto_dp_size_policy_table():
    # (batch, devices) -> expected data-axis extent
    cases = {
        (1, 8): 1,
        (2, 8): 2,
        (3, 8): 3,
        (4, 8): 4,
        (6, 8): 6,
        (8, 8): 8,
        (12, 8): 6,  # largest divisor of 12 that fits 8 devices
        (16, 8): 8,
        (5, 8): 5,
        (7, 8): 7,
        (9, 8): 3,
        (11, 8): 1,  # prime > devices: single-chip
    }
    for (batch, dev), want in cases.items():
        assert auto_data_parallel_size(batch, dev) == want, (batch, dev)


def test_auto_dp_size_with_grad_accum():
    # the unit that must split evenly is the micro-batch batch/accum
    assert auto_data_parallel_size(8, 8, micro_factor=2) == 4
    assert auto_data_parallel_size(16, 8, micro_factor=2) == 8
    assert auto_data_parallel_size(4, 8, micro_factor=4) == 1
    with pytest.raises(ValueError):
        auto_data_parallel_size(6, 8, micro_factor=4)  # accum doesn't divide
    with pytest.raises(ValueError):
        auto_data_parallel_size(0, 8)


@pytest.fixture(scope="module")
def tiny_hr_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("autocap_hr")
    rng = np.random.default_rng(3)
    for i in range(4):
        coarse = rng.random((12, 12, 3), dtype=np.float32)
        img = np.clip(np.repeat(np.repeat(coarse, 4, 0), 4, 1), 0, 1)
        np.save(root / f"img{i}.npy", img.astype(np.float32))
    return root


@pytest.mark.parametrize(
    "scale,depth,batch",
    [
        pytest.param(0.7, 5, 2, id="e2-scale0.7-d5-bs2"),
        pytest.param(0.8, 5, 1, id="e2-scale0.8-d5-bs1"),
    ],
)
def test_e2_small_batch_arms_train_on_8_mesh(tiny_hr_dir, tmp_path, scale, depth, batch):
    """The reference E2 arms with batch < mesh train instead of refusing.

    Same scale/depth/batch as run_experiment_adaptive_depth.sh:47-55 (tiny
    channels/patch so the CPU run is fast); config.json must record the
    capped device count.
    """
    from adunet.cli.train_sr import main as train_main

    log_dir = tmp_path / "logs"
    train_main([
        "--scale", str(scale),
        "--depth_override", str(depth),
        "--max_depth", str(depth),
        "--base_channels", "4",
        "--residual_head_channels", "4",
        "--patch_size", "32",
        "--patches_per_image", "2",
        "--batch_size", str(batch),
        "--epochs", "1",
        "--patience", "2",
        "--high_res_dir", str(tiny_hr_dir),
        "--image_suffix", ".npy",
        "--model_dir", str(tmp_path / "models"),
        "--log_dir", str(log_dir),
        "--run_name", "arm",
        "--seed", "0",
    ])
    cfg = json.loads((log_dir / "arm" / "config.json").read_text())
    assert cfg["n_devices"] == batch  # capped to the batch size
    assert (log_dir / "arm" / "epoch_metrics.csv").exists()


def test_explicit_n_devices_still_guards(tiny_hr_dir, tmp_path):
    """An explicit --n_devices request fails loudly, not silently shrinks."""
    import jax

    if jax.device_count() < 8:
        pytest.skip("needs the virtual 8-device mesh")
    from adunet.cli.train_sr import main as train_main

    with pytest.raises(ValueError, match="divisible"):
        train_main([
            "--scale", "0.5",
            "--depth_override", "1",
            "--base_channels", "4",
            "--patch_size", "32",
            "--patches_per_image", "2",
            "--batch_size", "4",
            "--n_devices", "8",
            "--epochs", "1",
            "--high_res_dir", str(tiny_hr_dir),
            "--image_suffix", ".npy",
            "--model_dir", str(tmp_path / "m"),
            "--log_dir", str(tmp_path / "l"),
            "--run_name", "guard",
        ])


def test_seg_small_batch_autocaps_on_8_mesh(tmp_path):
    """train_seg with batch 4 (the runbook quick arm) trains on 8 devices."""
    import jax

    if jax.device_count() < 8:
        pytest.skip("needs the virtual 8-device mesh")
    rng = np.random.default_rng(0)
    img_dir = tmp_path / "images"
    mask_dir = tmp_path / "masks"
    img_dir.mkdir()
    mask_dir.mkdir()
    for i in range(6):
        np.save(img_dir / f"isic_{i:04d}.npy", rng.random((24, 24, 3), dtype=np.float32))
        mask = np.zeros((24, 24), np.float32)
        mask[6:18, 6:18] = 1.0
        np.save(mask_dir / f"isic_{i:04d}_segmentation.npy", mask)
    from adunet.cli.train_seg import main as seg_main

    seg_main([
        "--protocol", "A",
        "--train_images", str(img_dir),
        "--train_masks", str(mask_dir),
        "--val_images", str(img_dir),
        "--val_masks", str(mask_dir),
        "--image_size", "24",
        "--base_channels", "4",
        "--depth", "2",
        "--batch_size", "4",
        "--epochs", "1",
        "--model_dir", str(tmp_path / "models"),
        "--log_dir", str(tmp_path / "logs"),
        "--run_name", "segcap",
    ])
    cfg = json.loads((tmp_path / "logs" / "segcap" / "config.json").read_text())
    assert cfg["n_devices"] == 4
