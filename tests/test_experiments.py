"""Sweep driver tests: plan tables, metadata, sbatch emission."""

import pytest

from adunet.experiments import (
    EXPERIMENT2_DEPTHS,
    sweep_runs,
    write_metadata,
)


def test_fixed_depth_plan_matches_reference_table():
    plans = sweep_runs("fixed_depth", high_res_dir="/data/hr", tpu_batches=False)
    assert len(plans) == 8
    by_scale = {p.metadata["scale"]: p for p in plans}
    assert by_scale[0.5].metadata["batch_size"] == 6  # 2080Ti table
    assert by_scale[0.8].metadata["batch_size"] == 1
    assert all(p.metadata["depth"] == 3 for p in plans)
    assert "--depth_override" in plans[0].argv


def test_adaptive_depth_plan_matches_design_table():
    plans = sweep_runs("adaptive_depth", high_res_dir="/data/hr", tpu_batches=False)
    by_scale = {p.metadata["scale"]: p for p in plans}
    for scale, depth in EXPERIMENT2_DEPTHS.items():
        assert by_scale[scale].metadata["depth"] == depth
    # deep models get remat
    assert "--remat" in by_scale[0.7].argv
    assert "--remat" not in by_scale[0.3].argv


def test_tpu_batches_are_mesh_divisible():
    plans = sweep_runs("adaptive_depth", high_res_dir="/data/hr", tpu_batches=True)
    assert all(p.metadata["batch_size"] % 8 == 0 for p in plans)


def test_seg_sweep_real_support():
    dirs = {k: f"/data/{k}" for k in ("train_images", "train_masks", "val_images", "val_masks")}
    plans = sweep_runs("seg_protocols", seg_dirs=dirs, protocols=("A", "B"), seeds=(1, 2), epochs=0)
    assert len(plans) == 4
    assert {p.metadata["protocol"] for p in plans} == {"A", "B"}


def test_metadata_and_sbatch_emission(tmp_path):
    plans = sweep_runs("fixed_depth", high_res_dir="/data/hr", scales=[0.5])
    path = write_metadata(plans[0], tmp_path)
    text = path.read_text()
    assert "scale: 0.5" in text and "argv:" in text

    from adunet.cli.run_experiment import main as sweep_main

    sweep_main([
        "--experiment", "fixed_depth",
        "--mode", "sbatch",
        "--high_res_dir", "/data/hr",
        "--scales", "0.5",
        "--metadata_dir", str(tmp_path / "meta"),
        "--sbatch_dir", str(tmp_path / "sbatch"),
    ])
    scripts = list((tmp_path / "sbatch").glob("*.sbatch"))
    assert len(scripts) == 1
    assert "python -m adunet.cli.train_sr" in scripts[0].read_text()


def test_unknown_experiment_raises():
    with pytest.raises(ValueError):
        sweep_runs("nope", high_res_dir="/x")


def test_run_mode_with_auto_eval(tmp_path):
    """Sweep 'run' mode end-to-end on CPU: train one scale, auto-evaluate,
    artifacts land in the reference layout."""
    import numpy as np

    hr = tmp_path / "hr"
    hr.mkdir()
    rng = np.random.default_rng(0)
    for i in range(6):
        coarse = rng.random((12, 12, 3), dtype=np.float32)
        np.save(hr / f"im{i}.npy", np.clip(np.repeat(np.repeat(coarse, 4, 0), 4, 1), 0, 1))

    from adunet.cli.run_experiment import main as sweep_main

    sweep_main([
        "--experiment", "fixed_depth",
        "--mode", "run",
        "--auto_eval",
        "--scales", "0.5",
        "--epochs", "1",
        "--high_res_dir", str(hr),
        "--image_suffix", ".npy",
        "--model_dir", str(tmp_path / "models"),
        "--log_dir", str(tmp_path / "logs"),
        "--metadata_dir", str(tmp_path / "metadata"),
        "--reference_batches",
        "--no_mixed_precision",
        "--eval_patch_size", "32",
        "--extra_args",
        "--image_suffix", ".npy",
        "--patch_size", "32",
        "--patches_per_image", "1",
        "--batch_size", "8",
        "--base_channels", "8",
        "--residual_head_channels", "8",
        "--n_devices", "8",
    ])
    # training artifacts
    assert (tmp_path / "metadata" / "exp_fixed_depth_scale0.50_depth3.txt").exists()
    eval_dirs = list((tmp_path / "logs" / "evaluation").glob("*_eval"))
    assert eval_dirs, "auto-eval report missing"
    assert (eval_dirs[0] / "metrics.json").exists()


def test_tune_experiment_emission(tmp_path):
    """tune_sr/tune_seg get print + sbatch emission paths (the reference's
    tune_unet_optuna.sbatch counterpart, SURVEY.md §2.4)."""
    import contextlib
    import io

    from adunet.cli.run_experiment import main as sweep_main

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        sweep_main([
            "--experiment", "tune_sr", "--mode", "print",
            "--high_res_dir", "/data/hr", "--n_trials", "7",
            "--metadata_dir", str(tmp_path / "meta"),
            "--log_dir", str(tmp_path / "logs"),
        ])
    out = buf.getvalue()
    assert "adunet.cli.tune" in out and "--n-trials 7" in out and "--retrain" in out
    assert (tmp_path / "meta" / "tune_sr.txt").exists()

    sweep_main([
        "--experiment", "tune_seg", "--mode", "sbatch",
        "--train_images", "/d/ti", "--train_masks", "/d/tm",
        "--val_images", "/d/vi", "--val_masks", "/d/vm",
        "--metadata_dir", str(tmp_path / "meta"),
        "--log_dir", str(tmp_path / "logs"),
        "--sbatch_dir", str(tmp_path / "sbatch"),
    ])
    script = (tmp_path / "sbatch" / "tune_seg.sbatch").read_text()
    assert "python -m adunet.cli.tune" in script and "--workload seg" in script


def test_run_mode_reference_small_batch_arm_on_8_mesh(tmp_path):
    """The reference E2 batch table's smallest arm (scale 0.8 -> depth 5,
    batch 1; run_experiment_adaptive_depth.sh:47-55) trains through the sweep
    driver on the 8-device mesh: the trainers' batch-vs-mesh auto-cap
    (VERDICT r4 weak #2) makes every reference batch size runnable without
    per-arm --n_devices plumbing."""
    import json

    import numpy as np

    hr = tmp_path / "hr"
    hr.mkdir()
    rng = np.random.default_rng(1)
    for i in range(4):
        coarse = rng.random((12, 12, 3), dtype=np.float32)
        np.save(hr / f"im{i}.npy", np.clip(np.repeat(np.repeat(coarse, 4, 0), 4, 1), 0, 1))

    from adunet.cli.run_experiment import main as sweep_main

    sweep_main([
        "--experiment", "adaptive_depth",
        "--mode", "run",
        "--scales", "0.8",
        "--epochs", "1",
        "--high_res_dir", str(hr),
        "--image_suffix", ".npy",
        "--model_dir", str(tmp_path / "models"),
        "--log_dir", str(tmp_path / "logs"),
        "--metadata_dir", str(tmp_path / "metadata"),
        "--reference_batches",  # batch 1 at scale 0.8, as the reference table
        "--no_mixed_precision",
        "--extra_args",
        "--image_suffix", ".npy",
        "--patch_size", "32",
        "--patches_per_image", "1",
        "--base_channels", "4",
        "--residual_head_channels", "4",
    ])
    meta = tmp_path / "metadata" / "exp_adaptive_depth_scale0.80_depth5.txt"
    assert meta.exists()
    cfgs = list((tmp_path / "logs").glob("*/config.json"))
    assert cfgs, "run config missing"
    cfg = json.loads(cfgs[0].read_text())
    assert cfg["batch_size"] == 1  # the reference table's value survived
    assert cfg["n_devices"] == 1  # auto-capped from the 8-device mesh
