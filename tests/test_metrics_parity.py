"""PSNR/SSIM/MS-SSIM parity against tf.image, plus Dice/IoU closed-form tests.

The reference's entire quality-evaluation surface is tf.image metrics on
BT.601 luma (evaluate_model.py:118-121); here the jnp rebuilds are validated
against tf on CPU so the baseline tables in BASELINE.md remain comparable.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from adunet.metrics import psnr, ssim, ssim_multiscale, mse_per_image, dice_coefficient, iou_score
from adunet.ops import rgb_to_luma_bt601

tf = pytest.importorskip("tensorflow")


def _pair(n=2, h=160, w=160, c=1, seed=0, noise=0.05):
    rng = np.random.default_rng(seed)
    a = rng.random((n, h, w, c), dtype=np.float32)
    b = np.clip(a + rng.normal(0, noise, a.shape).astype(np.float32), 0, 1)
    return a, b


def test_psnr_matches_tf():
    a, b = _pair()
    ours = np.asarray(psnr(jnp.asarray(a), jnp.asarray(b)))
    theirs = tf.image.psnr(a, b, max_val=1.0).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_psnr_identical_is_inf():
    a, _ = _pair()
    assert np.all(np.isinf(np.asarray(psnr(jnp.asarray(a), jnp.asarray(a)))))


def test_ssim_matches_tf():
    a, b = _pair()
    ours = np.asarray(ssim(jnp.asarray(a), jnp.asarray(b)))
    theirs = tf.image.ssim(a, b, max_val=1.0).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5, rtol=1e-5)


def test_ssim_rgb_matches_tf():
    a, b = _pair(c=3, h=96, w=128, seed=3)
    ours = np.asarray(ssim(jnp.asarray(a), jnp.asarray(b)))
    theirs = tf.image.ssim(a, b, max_val=1.0).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("hw", [(176, 176), (180, 200)])
def test_msssim_matches_tf(hw):
    a, b = _pair(h=hw[0], w=hw[1], seed=5)
    ours = np.asarray(ssim_multiscale(jnp.asarray(a), jnp.asarray(b)))
    theirs = tf.image.ssim_multiscale(a, b, max_val=1.0).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=1e-4)


def test_msssim_shaved_patch_shape():
    """The eval pipeline feeds 256-shave patches (e.g. 248x248 at scale 0.5)."""
    a, b = _pair(h=248, w=248, seed=9)
    ours = np.asarray(ssim_multiscale(jnp.asarray(a), jnp.asarray(b)))
    theirs = tf.image.ssim_multiscale(a, b, max_val=1.0).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=1e-4)


def test_luma_matches_reference_formula():
    rng = np.random.default_rng(11)
    img = rng.random((2, 8, 8, 3), dtype=np.float32)
    ours = np.asarray(rgb_to_luma_bt601(jnp.asarray(img)))
    coeffs = np.array([65.481, 128.553, 24.966], dtype=np.float32)
    ref = np.clip((np.sum(img * coeffs, axis=-1, keepdims=True) + 16.0) / 255.0, 0, 1)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_mse_per_image():
    a, b = _pair()
    ours = np.asarray(mse_per_image(jnp.asarray(a), jnp.asarray(b)))
    ref = np.mean((a - b) ** 2, axis=(1, 2, 3))
    np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_dice_and_iou_closed_form():
    y_true = np.zeros((1, 4, 4, 1), np.float32)
    y_true[0, :2] = 1.0  # 8 positive pixels
    y_pred = np.zeros((1, 4, 4, 1), np.float32)
    y_pred[0, :1] = 1.0  # 4 predicted, all correct
    # preds are clipped to [1e-7, 1-1e-7] before the sums (reference :261)
    d = float(dice_coefficient(jnp.asarray(y_true), jnp.asarray(y_pred)))
    i = float(iou_score(jnp.asarray(y_true), jnp.asarray(y_pred)))
    assert abs(d - 2 * 4 / (8 + 4)) < 1e-4
    assert abs(i - 4 / 8) < 1e-4


def test_dice_perfect_is_one():
    y = np.ones((2, 8, 8, 1), np.float32)
    assert float(dice_coefficient(jnp.asarray(y), jnp.asarray(y))) == pytest.approx(1.0, abs=1e-5)


def test_ssim_msssim_fuzz_random_shapes_vs_tf():
    """Randomized sweep vs tf.image: SSIM over arbitrary (H, W) >= the 11px
    filter, MS-SSIM over shapes >= the 5-scale floor (>=176px after the
    reference's shave). Guards the Gaussian-window edge math and the
    per-scale downsampling across shapes the fixed tests don't pin."""
    rng = np.random.default_rng(77)
    for _ in range(12):
        h, w = int(rng.integers(11, 120)), int(rng.integers(11, 120))
        a = rng.random((2, h, w, 3), dtype=np.float32)
        b = np.clip(a + rng.normal(0, 0.05, a.shape).astype(np.float32), 0, 1)
        ours = np.asarray(ssim(jnp.asarray(a), jnp.asarray(b)))
        theirs = tf.image.ssim(a, b, max_val=1.0).numpy()
        np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=1e-4,
                                   err_msg=f"ssim {h}x{w}")
    for _ in range(4):
        h, w = int(rng.integers(176, 320)), int(rng.integers(176, 320))
        a = rng.random((1, h, w, 3), dtype=np.float32)
        b = np.clip(a + rng.normal(0, 0.05, a.shape).astype(np.float32), 0, 1)
        ours = np.asarray(ssim_multiscale(jnp.asarray(a), jnp.asarray(b)))
        theirs = tf.image.ssim_multiscale(a, b, max_val=1.0).numpy()
        np.testing.assert_allclose(ours, theirs, atol=5e-5, rtol=2e-4,
                                   err_msg=f"msssim {h}x{w}")
