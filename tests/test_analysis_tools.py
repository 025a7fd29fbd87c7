"""Log→CSV→plots round-trip for the analysis/reporting layer."""

import json
from pathlib import Path

import pytest


def _write_log(path: Path, fmt: str) -> None:
    if fmt == "ours":
        lines = [
            "Model: depth=3 params=8,637,379 devices=8",
            "Epoch 1/3 - 12.4s - 96ms/step - 41.3 img/s - loss: 0.0312 - psnr: 29.10 - val_loss: 0.0298 - val_psnr: 29.80",
            "Epoch 2/3 - 11.9s - 92ms/step - 43.1 img/s - loss: 0.0250 - psnr: 30.55 - val_loss: 0.0240 - val_psnr: 30.90",
            "Epoch 3/3 - 11.8s - 91ms/step - 43.4 img/s - loss: 0.0238 - psnr: 30.90 - val_loss: 0.0251 - val_psnr: 30.70",
        ]
    else:  # reference Keras verbose-2 format
        lines = [
            "Epoch 1/3",
            "540/540 - 270s - 500ms/step - loss: 0.0312 - psnr: 29.10 - val_loss: 0.0298 - val_psnr: 29.80",
            "Epoch 2/3",
            "540/540 - 268s - 496ms/step - loss: 0.0250 - psnr: 30.55 - val_loss: 0.0240 - val_psnr: 30.90",
        ]
    path.write_text("\n".join(lines) + "\n")


@pytest.mark.parametrize("fmt", ["ours", "keras"])
def test_export_log_metrics_roundtrip(tmp_path, fmt):
    from adunet.cli.export_log_metrics import extract_epoch_rows, process_logs

    run_dir = tmp_path / "logs" / "run_scale0.50"
    run_dir.mkdir(parents=True)
    _write_log(run_dir / "run-simple-scale0.50.log", fmt)

    rows = extract_epoch_rows(run_dir / "run-simple-scale0.50.log")
    assert rows[0]["epoch"] == 1.0
    assert rows[0]["loss"] == pytest.approx(0.0312)
    assert rows[0]["val_psnr"] == pytest.approx(29.80)
    assert rows[0]["ms_per_step"] > 0

    emitted = process_logs(tmp_path / "logs", tmp_path / "csv")
    assert emitted and emitted[0][1].exists()


def test_analyse_and_summaries(tmp_path):
    from adunet.cli.export_log_metrics import process_logs
    from adunet.cli.analyse_experiment_metrics import load_summaries

    for scale in ("0.30", "0.50"):
        run_dir = tmp_path / "logs" / f"run_scale{scale}"
        run_dir.mkdir(parents=True)
        _write_log(run_dir / "train.log", "ours")
    process_logs(tmp_path / "logs", tmp_path / "csv")

    summaries = load_summaries(tmp_path / "csv")
    assert [s.scale for s in summaries] == [0.3, 0.5]
    # best val_loss is epoch 2 in the synthetic log
    assert summaries[0].best_epoch == 2
    assert summaries[0].best_val_psnr == pytest.approx(30.90)


def test_plot_experiment_metrics_schema(tmp_path):
    from adunet.cli.plot_experiment_metrics import load_summary_metrics, write_summary_csv

    eval_dir = tmp_path / "evaluation"
    for scale, psnr in (("0.30", 32.28), ("0.50", 37.76)):
        d = eval_dir / f"exp_scale{scale}_eval"
        d.mkdir(parents=True)
        (d / "metrics.json").write_text(json.dumps({
            "mse_mean": 1e-3, "mse_std": 1e-4,
            "psnr_mean": psnr, "psnr_std": 2.0,
            "ssim_mean": 0.9, "ssim_std": 0.05,
            "msssim_mean": 0.95, "msssim_std": 0.02,
            "samples": 10,
        }))
    rows = load_summary_metrics(eval_dir)
    out = tmp_path / "plots"
    out.mkdir()
    path = write_summary_csv(rows, out)
    header = path.read_text().splitlines()[0]
    assert header == ("scale,psnr_mean,psnr_std,ssim_mean,ssim_std,"
                      "msssim_mean,msssim_std,mse_mean,mse_std,samples")
