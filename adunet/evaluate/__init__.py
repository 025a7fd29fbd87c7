"""Offline evaluation: grid tiling, Y-channel metrics, JSON/CSV reports."""

from adunet.evaluate.evaluator import (
    EvalResults,
    evaluate_sr,
    infer_eval_shave,
    write_outputs,
    attach_filenames,
)

__all__ = [
    "EvalResults",
    "evaluate_sr",
    "infer_eval_shave",
    "write_outputs",
    "attach_filenames",
]
