"""Tests for the synthetic corpus generators (scripts/make_synth_corpus.py).

DIV2K is absent from this environment (SURVEY §6), so sweep-scale quality
evidence rides these generators; the natural mode's contract is that its
identity (pure bicubic degradation) PSNR-vs-scale curve has the SAME shape
as BASELINE.md's DIV2K tables — monotone rising with scale through the
~29-39 dB band — so trained quality tables are visually comparable to the
reference's (VERDICT r3 #8).
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))
from make_synth_corpus import synth_image, synth_image_natural  # noqa: E402


@pytest.mark.parametrize("make", [synth_image, synth_image_natural])
def test_generator_contract(make):
    rng = np.random.default_rng(5)
    img = make(rng, 96)
    assert img.shape == (96, 96, 3)
    assert img.dtype == np.float32
    assert float(img.min()) >= 0.0 and float(img.max()) <= 1.0
    # not degenerate: real dynamic range and per-channel variation
    assert float(img.std()) > 0.05
    assert all(float(img[..., c].std()) > 0.01 for c in range(3))
    # deterministic from the seed (the sweeps' reproducibility contract)
    again = make(np.random.default_rng(5), 96)
    np.testing.assert_array_equal(img, again)


def _identity_psnr_y(images, scale):
    """Bicubic-degradation PSNR on BT.601 luma with the evaluator's shave —
    the identity-model anchor every trained run is compared against."""
    import cv2

    shave = 2 * round(1.0 / scale)
    vals = []
    for img in images:
        h, w = img.shape[:2]
        small = cv2.resize(img, (max(1, round(w * scale)), max(1, round(h * scale))),
                           interpolation=cv2.INTER_AREA)
        deg = np.clip(cv2.resize(small, (w, h), interpolation=cv2.INTER_CUBIC), 0.0, 1.0)
        def luma(x):
            return (65.481 * x[..., 0] + 128.553 * x[..., 1] + 24.966 * x[..., 2] + 16.0) / 255.0
        y_ref, y_deg = luma(img), luma(deg)
        if shave:
            y_ref, y_deg = y_ref[shave:-shave, shave:-shave], y_deg[shave:-shave, shave:-shave]
        mse = float(np.mean((y_ref - y_deg) ** 2))
        vals.append(np.inf if mse == 0 else 10.0 * np.log10(1.0 / mse))
    return float(np.mean(vals))


def test_natural_mode_psnr_scale_ordering():
    cv2 = pytest.importorskip("cv2")  # noqa: F841
    rng = np.random.default_rng(777)
    images = [synth_image_natural(rng, 256) for _ in range(6)]
    curve = [_identity_psnr_y(images, s) for s in (0.2, 0.5, 0.9)]
    # monotone rising with scale, like BASELINE.md's DIV2K band
    assert curve[0] < curve[1] < curve[2], curve
    # in the natural-image band: harsh at 0.2, gentle at 0.9 (generous
    # bounds — 256px eval sits ~1 dB off the 512px production numbers)
    assert 25.0 < curve[0] < 34.0, curve
    assert 33.0 < curve[2] < 43.0, curve
