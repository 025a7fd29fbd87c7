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


def test_export_log_metrics_flat_layout(tmp_path):
    """Sweep drivers emit flat ``<run>.log`` transcripts (no per-run dirs);
    each file must be mined as its own run, named by the log stem — the
    round-4 sweep's transcripts/ dir is exactly this layout."""
    from adunet.cli.export_log_metrics import process_logs

    logs = tmp_path / "logs"
    logs.mkdir()
    for scale in ("0.2", "0.5"):
        _write_log(logs / f"run-simple-scale{scale}.log", "ours")
    # tail noise lines (the trainer's per-epoch "[epoch tail: …]" diagnostics)
    with (logs / "run-simple-scale0.2.log").open("a") as fh:
        fh.write("  [epoch tail: val 0.3s ckpt 3.5s best-pull 0.0s]\n")

    emitted = dict(process_logs(logs, tmp_path / "csv"))
    assert set(emitted) == {"run-simple-scale0.2", "run-simple-scale0.5"}
    rows = (tmp_path / "csv" / "run-simple-scale0.2" / "epoch_metrics.csv").read_text().splitlines()
    assert len(rows) == 4  # header + 3 epochs; the tail line adds no row


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


def test_summarize_run_tolerates_truncated_final_row(tmp_path):
    """A CSV whose last line was cut mid-write must keep columns row-aligned
    (short rows pad with NaN rather than shifting values)."""
    from adunet.cli.analyse_experiment_metrics import summarize_run

    run_dir = tmp_path / "run_scale0.50"
    run_dir.mkdir()
    (run_dir / "epoch_metrics.csv").write_text(
        "epoch,steps,duration_s,ms_per_step,loss,psnr,val_loss,val_psnr\n"
        "1,3,1.0,333,0.05,20.0,0.04,21.0\n"
        "2,3,1.0,333,0.03,22.0,0.02,23.0\n"
        "3,3,1.0\n"  # truncated mid-write
    )
    s = summarize_run(run_dir / "epoch_metrics.csv")
    assert s.best_epoch == 2
    assert s.best_val_psnr == 23.0


def test_summary_csv_quotes_labels_with_commas(tmp_path):
    from adunet.cli.analyse_experiment_metrics import RunSummary, write_summary_csv
    import csv as _csv

    s = RunSummary(label="exp,weird", scale=0.5, best_epoch=1, best_val_loss=0.1,
                   best_val_psnr=30.0, steps_per_epoch=3, epoch_time_s=1.0,
                   ms_per_step=300.0)
    write_summary_csv([s], tmp_path)
    with (tmp_path / "run_summaries.csv").open() as fh:
        rows = list(_csv.reader(fh))
    assert rows[1][0] == "exp,weird" and float(rows[1][1]) == 0.5


def test_seg_pair_dataset_drop_remainder(tmp_path):
    import numpy as np

    from adunet.data.seg_pipeline import SegPairDataset

    pairs = []
    for i in range(10):
        img = tmp_path / f"i{i}.npy"
        msk = tmp_path / f"i{i}_mask.npy"
        np.save(img, np.zeros((8, 8, 3), np.float32))
        np.save(msk, np.zeros((8, 8), np.float32))
        pairs.append((str(img), str(msk)))

    ds = SegPairDataset(pairs, batch_size=4, image_size=8, augment=False,
                        shuffle=False, seed=0, drop_remainder=True)
    sizes = [b[0].shape[0] for b in ds]
    assert sizes == [4, 4]  # ragged tail of 2 dropped
    assert ds.steps_per_epoch == 2

    ds2 = SegPairDataset(pairs, batch_size=4, image_size=8, augment=False,
                         shuffle=False, seed=0)
    assert [b[0].shape[0] for b in ds2] == [4, 4, 2]

    # too few pairs for one full batch must be a loud error, not a silent
    # ragged batch that later fails to shard over the mesh
    with pytest.raises(ValueError, match="drop_remainder"):
        SegPairDataset(pairs[:3], batch_size=4, image_size=8, augment=False,
                       shuffle=False, seed=0, drop_remainder=True)
