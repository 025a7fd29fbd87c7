"""Generate analysis figures from per-epoch CSV exports.

Rebuild of /root/reference/Super_resolution/code/analyse_experiment_metrics.py:
per-run best-val summaries, quality-vs-scale trend, convergence speed, and
training-load figures. Accepts both this framework's epoch CSVs
(``steps`` column) and the reference's (``steps_total``).
"""

from __future__ import annotations

import argparse
import csv
import math
import re
from dataclasses import dataclass
from pathlib import Path
from typing import List, Sequence

__all__ = ["RunSummary", "read_run_summary", "load_summaries"]

SCALE_RE = re.compile(r"scale([0-9.]+)")


@dataclass
class RunSummary:
    label: str
    scale: float
    best_epoch: int
    best_val_loss: float
    best_val_psnr: float
    steps_per_epoch: int
    epoch_time_s: float
    ms_per_step: float


def parse_scale(run_name: str) -> float:
    match = SCALE_RE.search(run_name)
    if not match:
        raise ValueError(f"Could not infer scale from run directory name: {run_name}")
    return float(match.group(1).rstrip("."))


def _as_float(row: dict, key: str) -> float:
    value = row.get(key)
    if value in (None, ""):
        return math.nan
    try:
        return float(value)
    except ValueError:
        return math.nan


def read_run_summary(csv_path: Path) -> RunSummary:
    scale = parse_scale(csv_path.parent.name)
    with csv_path.open("r", encoding="utf-8") as handle:
        rows = list(csv.DictReader(handle))
    if not rows:
        raise ValueError(f"CSV {csv_path} is empty.")

    val_rows = [row for row in rows if row.get("val_loss")]
    best_row = min(val_rows, key=lambda row: float(row["val_loss"])) if val_rows else rows[-1]

    steps = _as_float(best_row, "steps_total")
    if math.isnan(steps):
        steps = _as_float(best_row, "steps")

    def to_int(value: float) -> int:
        return 0 if math.isnan(value) else int(value)

    return RunSummary(
        label=csv_path.parent.name,
        scale=scale,
        best_epoch=to_int(_as_float(best_row, "epoch")),
        best_val_loss=_as_float(best_row, "val_loss"),
        best_val_psnr=_as_float(best_row, "val_psnr"),
        steps_per_epoch=to_int(steps),
        epoch_time_s=_as_float(best_row, "duration_s"),
        ms_per_step=_as_float(best_row, "ms_per_step"),
    )


def load_summaries(csv_root: Path) -> List[RunSummary]:
    summaries = [
        read_run_summary(p) for p in sorted(csv_root.glob("*/epoch_metrics.csv"))
    ]
    if not summaries:
        raise SystemExit(f"No CSV files found under {csv_root}")
    summaries.sort(key=lambda s: s.scale)
    return summaries


def plot_trend(summaries: Sequence[RunSummary], output_dir: Path, dpi: int) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    scales = [s.scale for s in summaries]
    fig, ax1 = plt.subplots(figsize=(7, 4))
    ax1.plot(scales, [s.best_val_loss for s in summaries], "o-", color="tab:red", label="best val loss")
    ax1.set_xlabel("scale")
    ax1.set_ylabel("best val loss", color="tab:red")
    ax2 = ax1.twinx()
    ax2.plot(scales, [s.best_val_psnr for s in summaries], "s-", color="tab:blue", label="best val PSNR")
    ax2.set_ylabel("best val PSNR (dB)", color="tab:blue")
    fig.suptitle("Quality vs scale")
    fig.tight_layout()
    fig.savefig(output_dir / "trend_quality_vs_scale.png", dpi=dpi)
    plt.close(fig)


def plot_training_speed(summaries: Sequence[RunSummary], output_dir: Path, dpi: int) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    scales = [s.scale for s in summaries]
    fig, ax = plt.subplots(figsize=(7, 4))
    ax.plot(scales, [s.ms_per_step for s in summaries], "o-")
    ax.set_xlabel("scale")
    ax.set_ylabel("ms / step")
    ax.set_title("Training speed vs scale")
    fig.tight_layout()
    fig.savefig(output_dir / "training_speed.png", dpi=dpi)
    plt.close(fig)


def plot_training_load(summaries: Sequence[RunSummary], output_dir: Path, dpi: int) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    scales = [s.scale for s in summaries]
    fig, ax1 = plt.subplots(figsize=(7, 4))
    ax1.bar([str(s) for s in scales], [s.steps_per_epoch for s in summaries], color="tab:gray")
    ax1.set_xlabel("scale")
    ax1.set_ylabel("steps / epoch")
    ax2 = ax1.twinx()
    ax2.plot([str(s) for s in scales], [s.epoch_time_s for s in summaries], "o-", color="tab:orange")
    ax2.set_ylabel("epoch time (s)", color="tab:orange")
    fig.suptitle("Training load vs scale")
    fig.tight_layout()
    fig.savefig(output_dir / "training_load.png", dpi=dpi)
    plt.close(fig)


def write_summary_csv(summaries: Sequence[RunSummary], output_dir: Path) -> None:
    with (output_dir / "run_summaries.csv").open("w", newline="") as handle:
        writer = csv.writer(handle)
        writer.writerow(
            ["label", "scale", "best_epoch", "best_val_loss", "best_val_psnr",
             "steps_per_epoch", "epoch_time_s", "ms_per_step"]
        )
        for s in summaries:
            writer.writerow(
                [s.label, s.scale, s.best_epoch, s.best_val_loss, s.best_val_psnr,
                 s.steps_per_epoch, s.epoch_time_s, s.ms_per_step]
            )


def main() -> None:
    parser = argparse.ArgumentParser(description="Analyse per-epoch training CSVs.")
    parser.add_argument("--csv-root", type=Path, required=True)
    parser.add_argument("--output-dir", type=Path, default=None)
    parser.add_argument("--dpi", type=int, default=140)
    args = parser.parse_args()

    csv_root = args.csv_root.expanduser().resolve()
    output_dir = (args.output_dir or csv_root.parent / "analysis").expanduser().resolve()
    output_dir.mkdir(parents=True, exist_ok=True)

    summaries = load_summaries(csv_root)
    write_summary_csv(summaries, output_dir)
    plot_trend(summaries, output_dir, args.dpi)
    plot_training_speed(summaries, output_dir, args.dpi)
    plot_training_load(summaries, output_dir, args.dpi)
    print(f"Wrote analysis to {output_dir}")


if __name__ == "__main__":
    main()
