"""End-to-end tests for the BASELINE reproduction runbook (VERDICT r3 #6).

scripts/reproduce_baseline.sh is the one-command path from staged dataset
dirs to the reference-schema summary tables (E1/E2 sweeps + seg protocols,
matching train_adaptive_simple.sbatch:202-224's train->auto-eval chain).
DIV2K/ISIC are absent here, so both tests drive it with --synthetic
stand-ins through the same entry points.
"""

from __future__ import annotations

import os
import subprocess
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
SCRIPT = ROOT / "scripts" / "reproduce_baseline.sh"


def _run(args, cwd):
    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")
    env["PYTHONPATH"] = str(ROOT) + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        ["bash", str(SCRIPT), *args], cwd=cwd, env=env,
        capture_output=True, text=True, timeout=1800,
    )


def test_runbook_print_mode_plans_all_tables(tmp_path):
    out = tmp_path / "repro"
    proc = _run(["--synthetic", "--quick", "--mode", "print", "--out", str(out)], tmp_path)
    assert proc.returncode == 0, proc.stderr[-2000:]
    # all three table producers are planned with resolved dataset paths
    assert "adunet.cli.train_sr" in proc.stdout
    assert "exp_fixed_depth_scale0.50_depth3" in proc.stdout
    assert "exp_adaptive_depth_scale0.50_depth3" in proc.stdout
    assert "adunet.cli.train_seg" in proc.stdout
    assert str(out / "synth" / "train_hr") in proc.stdout
    # metadata emitted even in print mode (reference sweep-driver behavior)
    assert list((out / "fixed_depth" / "metadata").glob("*.txt"))


def test_runbook_quick_run_produces_reference_schema_tables(tmp_path):
    out = tmp_path / "repro"
    proc = _run(["--synthetic", "--quick", "--mode", "run", "--out", str(out)], tmp_path)
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])
    for exp in ("fixed_depth", "adaptive_depth"):
        summary = out / exp / "plots" / "summary_metrics.csv"
        assert summary.exists(), f"missing {summary}"
        header = summary.read_text().splitlines()[0]
        assert "psnr" in header.lower()
        # the auto-eval chain ran: per-run eval reports in reference schema
        evals = list((out / exp / "logs" / "evaluation").glob("*/metrics.json"))
        assert evals, f"no eval reports under {exp}"
    # seg protocol run serialized its resolved config + final metrics
    seg_cfgs = list((out / "seg_protocols" / "logs").glob("**/config.json"))
    assert seg_cfgs
