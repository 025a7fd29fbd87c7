"""Convert training stdout transcripts into per-epoch CSV files.

Rebuild of /root/reference/Super_resolution/code/export_log_metrics.py with
the same output schema (epoch, steps_completed, steps_total, duration_s,
ms_per_step, loss, psnr, val_loss, val_psnr). Parses both this framework's
single-line epoch summaries::

    Epoch 3/100 - 12.4s - 96ms/step - 41.3 img/s - loss: 0.0312 - psnr: 29.1 - val_loss: ...

and the reference's two-line Keras verbose-2 format (``Epoch N/M`` header
followed by ``540/540 - 540s - 500ms/step - loss: ...``).
"""

from __future__ import annotations

import argparse
import csv
import re
from pathlib import Path
from typing import Dict, Iterable, List, Optional, Tuple

__all__ = ["parse_metrics_line", "extract_epoch_rows", "process_logs", "write_csv"]

EPOCH_RE = re.compile(r"^Epoch\s+(\d+)(?:/(\d+))?")
PROGRESS_RE = re.compile(r"^(?P<done>\d+)\s*/\s*(?P<total>\d+)$")
DURATION_RE = re.compile(r"^([0-9.]+)s$")
MS_PER_STEP_RE = re.compile(r"^([0-9.]+)\s*ms/step$")
IMG_PER_SEC_RE = re.compile(r"^([0-9.]+)\s*img/s$")

FIELDNAMES = [
    "epoch",
    "steps_completed",
    "steps_total",
    "duration_s",
    "ms_per_step",
    "loss",
    "psnr",
    "val_loss",
    "val_psnr",
]


def parse_metrics_line(line: str) -> Optional[Dict[str, float]]:
    """Parse one epoch summary line (either format) into a metrics dict."""
    if " - loss:" not in line or "ms/step" not in line:
        return None
    parts = [part.strip() for part in line.strip().split(" - ") if part.strip()]
    if len(parts) < 4:
        return None

    metrics: Dict[str, float] = {}
    head = parts[0]
    epoch_match = EPOCH_RE.match(head)
    progress_match = PROGRESS_RE.match(head)
    if epoch_match:  # this framework's single-line format
        metrics["epoch"] = float(epoch_match.group(1))
        parts.pop(0)
    elif progress_match:  # reference two-line format: progress counter first
        metrics["steps_completed"] = float(progress_match.group("done"))
        metrics["steps_total"] = float(progress_match.group("total"))
        parts.pop(0)
    else:
        return None

    for part in list(parts):
        m = DURATION_RE.match(part)
        if m:
            metrics["duration_s"] = float(m.group(1))
            parts.remove(part)
            continue
        m = MS_PER_STEP_RE.match(part)
        if m:
            metrics["ms_per_step"] = float(m.group(1))
            parts.remove(part)
            continue
        m = IMG_PER_SEC_RE.match(part)
        if m:
            metrics["img_per_sec"] = float(m.group(1))
            parts.remove(part)

    for item in parts:
        if ":" not in item:
            continue
        key, value = (seg.strip() for seg in item.split(":", 1))
        try:
            metrics[key.lower()] = float(value)
        except ValueError:
            continue
    return metrics


def extract_epoch_rows(log_path: Path) -> List[Dict[str, float]]:
    rows: List[Dict[str, float]] = []
    current_epoch: Optional[int] = None
    with log_path.open("r", encoding="utf-8") as handle:
        for raw_line in handle:
            line = raw_line.strip()
            if not line:
                continue
            epoch_match = EPOCH_RE.match(line)
            if epoch_match and " - " not in line:
                current_epoch = int(epoch_match.group(1))
                continue
            metrics = parse_metrics_line(line)
            if metrics is None:
                continue
            if "epoch" not in metrics:
                if current_epoch is None:
                    continue
                metrics["epoch"] = float(current_epoch)
            rows.append(metrics)
    return rows


def write_csv(rows: Iterable[Dict[str, float]], output_path: Path) -> None:
    rows = list(rows)
    if not rows:
        return
    output_path.parent.mkdir(parents=True, exist_ok=True)
    with output_path.open("w", newline="", encoding="utf-8") as handle:
        writer = csv.DictWriter(handle, fieldnames=FIELDNAMES)
        writer.writeheader()
        for row in rows:
            writer.writerow({key: row.get(key) for key in FIELDNAMES})


def process_logs(
    logs_root: Path, output_root: Path, pattern: str = "*.log"
) -> List[Tuple[str, Path]]:
    emitted: List[Tuple[str, Path]] = []
    for run_dir in sorted(p for p in logs_root.iterdir() if p.is_dir()):
        log_files = sorted(run_dir.glob(pattern))
        if not log_files:
            continue
        rows = extract_epoch_rows(log_files[-1])
        if not rows:
            continue
        csv_path = output_root / run_dir.name / "epoch_metrics.csv"
        write_csv(rows, csv_path)
        emitted.append((run_dir.name, csv_path))
    return emitted


def main() -> None:
    parser = argparse.ArgumentParser(description="Convert training logs into CSV tables.")
    parser.add_argument("--logs-root", type=Path, required=True)
    parser.add_argument("--output-root", type=Path, required=True)
    parser.add_argument("--pattern", type=str, default="*.log")
    args = parser.parse_args()

    logs_root = args.logs_root.expanduser().resolve()
    if not logs_root.is_dir():
        raise SystemExit(f"Logs root not found: {logs_root}")
    emitted = process_logs(logs_root, args.output_root.expanduser().resolve(), args.pattern)
    if not emitted:
        print("No logs were converted.")
        return
    print("Generated CSV files:")
    for run_name, csv_path in emitted:
        print(f"  {run_name} -> {csv_path}")


if __name__ == "__main__":
    main()
