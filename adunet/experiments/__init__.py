"""Experiment sweep drivers (fixed-depth, adaptive-depth, seg protocols)."""

from adunet.experiments.sweeps import (
    EXPERIMENT1_SCALES,
    EXPERIMENT1_BATCH_SIZES,
    EXPERIMENT2_DEPTHS,
    EXPERIMENT2_BATCH_SIZES,
    sweep_runs,
    write_metadata,
)

__all__ = [
    "EXPERIMENT1_SCALES",
    "EXPERIMENT1_BATCH_SIZES",
    "EXPERIMENT2_DEPTHS",
    "EXPERIMENT2_BATCH_SIZES",
    "sweep_runs",
    "write_metadata",
]
