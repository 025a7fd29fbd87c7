#!/usr/bin/env python
"""Round-5 natural-corpus comparison table (VERDICT r4 #5).

Prints the markdown table that puts the adaptive-depth (E2) PSNR-vs-scale
curve side by side across three corpora:

  * natural   — this repo's 1/f-spectrum synthetic corpus
                (scripts/make_synth_corpus.py --mode natural), trained by
                scripts/r5_natural_sweep.sh, pinned in
                experiments/round5_natural/GOLDEN.json;
  * structured — the round-4 sweep corpus (experiments/round4_sweep/GOLDEN.json);
  * DIV2K      — the reference's own trained numbers from
                 Super_resolution/experiments/experiment_2_adaptive_depth/
                 plots/summary_metrics.csv:1-10 (via BASELINE.md), the only
                 real-photo anchor available (DIV2K itself is absent here).

The point of the natural arm: the structured corpus saturates ~53 dB (its
statistics are easy), so only the CURVE SHAPE is comparable to the
reference's rising 32->41 dB DIV2K band. The 1/f corpus's identity-PSNR
anchors sit in the DIV2K band, making the trained curve shape-comparable
in absolute terms too.

Anchor column = identity model scored under the EXACT offline eval
protocol (scripts/r5_identity_anchor.py -> IDENTITY_ANCHORS.json), so the
"trained gain" row is a same-protocol subtraction. The training loop's
epoch-1 val PSNR is NOT used as the anchor: patch-level val PSNR is nearly
flat across scales on both synthetic corpora (grain-dominated), which would
understate the scale-graded difficulty the eval protocol sees.
"""
from __future__ import annotations

import json
import re
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]

# Reference E2 (adaptive depth) eval PSNR(Y) on DIV2K, per BASELINE.md
# ("Quality — Experiment 2"); source summary_metrics.csv:1-10. The 0.2
# column is "inf" in the reference CSV (degenerate eval artifact) — shown
# as the literal the reference shipped.
DIV2K_E2_PSNR = {
    0.2: "inf*",
    0.3: 32.321,
    0.4: 34.434,
    0.5: 37.649,
    0.6: 38.956,
    0.7: 40.012,
    0.8: 40.886,
}


def load_table(golden_path: Path, experiment: str = "adaptive_depth") -> dict[float, dict]:
    if not golden_path.exists():
        return {}
    golden = json.loads(golden_path.read_text())
    out = {}
    for run, pin in golden.get(experiment, {}).items():
        m = re.search(r"scale(\d+\.\d+)", run)
        if m:
            out[round(float(m.group(1)), 2)] = pin
    return out


def fmt(v, nd=2):
    if v is None:
        return "—"
    if isinstance(v, str):
        return v
    return f"{v:.{nd}f}"


def load_anchors() -> dict[float, float]:
    path = ROOT / "experiments/round5_natural/IDENTITY_ANCHORS.json"
    if not path.exists():
        return {}
    return {round(float(k), 2): v["psnr_mean"]
            for k, v in json.loads(path.read_text()).items()}


def main() -> None:
    nat_golden = ROOT / "experiments/round5_natural/GOLDEN.json"
    natural = load_table(nat_golden)
    natural_fixed = load_table(nat_golden, "fixed_depth")
    structured = load_table(ROOT / "experiments/round4_sweep/GOLDEN.json")
    anchors = load_anchors()
    scales = sorted(set(natural) | set(structured))

    print(
        "| scale | natural identity anchor (eval protocol) | natural E2 "
        "(adaptive) eval PSNR(Y) | natural E1 (fixed d3) eval PSNR(Y) | "
        "E2 gain over identity | structured E2 eval PSNR(Y) | "
        "reference DIV2K E2 PSNR(Y) |"
    )
    print("|---|---|---|---|---|---|---|")
    for s in scales:
        nat = natural.get(s)
        natf = natural_fixed.get(s)
        struc = structured.get(s)
        anchor = anchors.get(s)
        gain = (nat["psnr_mean"] - anchor) if (nat and anchor is not None) else None
        print(
            f"| {s} | {fmt(anchor)} | "
            f"{fmt(nat and nat['psnr_mean'])} | "
            f"{fmt(natf and natf['psnr_mean'])} | "
            f"{'+' if isinstance(gain, float) and gain >= 0 else ''}{fmt(gain)} | "
            f"{fmt(struc and struc['psnr_mean'])} | "
            f"{fmt(DIV2K_E2_PSNR.get(s))} |"
        )
    if natural and natural_fixed:
        deltas = {s: natural[s]["psnr_mean"] - natural_fixed[s]["psnr_mean"]
                  for s in sorted(set(natural) & set(natural_fixed))}
        print(
            "\nE2-vs-E1 on the natural corpus (adaptive minus fixed d3): "
            + ", ".join(f"{s:g}:{d:+.2f}" for s, d in deltas.items()) + " dB"
        )
    if natural and anchors:
        band = [anchors[s] for s in sorted(anchors)]
        print(
            f"\nnatural identity anchors (eval protocol): "
            f"{', '.join(f'{s:g}->{anchors[s]:.2f}' for s in sorted(anchors))} dB"
        )
        print(f"anchor spread: {max(band) - min(band):.2f} dB")


if __name__ == "__main__":
    main()
