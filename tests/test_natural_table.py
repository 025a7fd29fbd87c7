"""The round-5 three-corpus comparison table stays consistent with its
sources.

`scripts/r5_natural_table.py` is the generator of the quality table in
experiments/round5_natural/README.md (the natural-corpus counterpart of
the reference's plots/summary_metrics.csv tables,
Super_resolution/experiments/experiment_2_adaptive_depth/plots/
summary_metrics.csv:1-10). This locks the script's output against the
committed GOLDEN.json / IDENTITY_ANCHORS.json artifacts so a table edit
or a regression in the loaders cannot silently drift from the pinned
numbers.
"""

import json
import re
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def _run_table() -> str:
    proc = subprocess.run(
        [sys.executable, str(ROOT / "scripts" / "r5_natural_table.py")],
        capture_output=True,
        text=True,
        check=True,
    )
    return proc.stdout


def _golden_by_scale(golden_path: Path, experiment: str) -> dict:
    golden = json.loads(golden_path.read_text())
    out = {}
    for run, pin in golden.get(experiment, {}).items():
        m = re.search(r"scale(\d+\.\d+)", run)
        if m:
            out[round(float(m.group(1)), 2)] = pin
    return out


def test_table_rows_match_committed_goldens():
    out = _run_table()
    nat_golden = ROOT / "experiments/round5_natural/GOLDEN.json"
    adaptive = _golden_by_scale(nat_golden, "adaptive_depth")
    fixed = _golden_by_scale(nat_golden, "fixed_depth")
    structured = _golden_by_scale(
        ROOT / "experiments/round4_sweep/GOLDEN.json", "adaptive_depth"
    )
    anchors = {
        round(float(k), 2): v["psnr_mean"]
        for k, v in json.loads(
            (ROOT / "experiments/round5_natural/IDENTITY_ANCHORS.json").read_text()
        ).items()
    }

    rows = {}
    for line in out.splitlines():
        m = re.match(r"\| (\d+\.\d+) \|", line)
        if m:
            cells = [c.strip() for c in line.strip().strip("|").split("|")]
            rows[round(float(cells[0]), 2)] = cells

    # every sweep scale appears exactly once, with its pinned numbers
    assert set(rows) == set(adaptive) | set(structured)
    for s, cells in rows.items():
        (_, anchor_c, nat_c, natf_c, gain_c, struc_c, _div2k_c) = cells
        if s in anchors:
            assert anchor_c == f"{anchors[s]:.2f}"
        if s in adaptive:
            assert nat_c == f"{adaptive[s]['psnr_mean']:.2f}"
            assert gain_c == f"{adaptive[s]['psnr_mean'] - anchors[s]:+.2f}"
        else:
            assert nat_c == "—"
        if s in fixed:
            assert natf_c == f"{fixed[s]['psnr_mean']:.2f}"
        else:
            assert natf_c == "—"
        if s in structured:
            assert struc_c == f"{structured[s]['psnr_mean']:.2f}"

    # the E2-vs-E1 delta footer appears iff the fixed arm is pinned, and
    # carries the exact per-scale subtraction
    if fixed:
        m = re.search(r"E2-vs-E1 on the natural corpus[^:]*: (.+) dB", out)
        assert m, "delta footer missing despite a pinned fixed_depth arm"
        printed = dict(
            (float(k), v) for k, v in (p.split(":") for p in m.group(1).split(", "))
        )
        for s in sorted(set(adaptive) & set(fixed)):
            expect = adaptive[s]["psnr_mean"] - fixed[s]["psnr_mean"]
            assert printed[s] == f"{expect:+.2f}"
