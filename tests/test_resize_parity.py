"""Parity of the matmul-resize primitive against the reference's actual ops.

Oracles: tf.image.resize (what ResizeByScale/ResizeToMatch wrap,
shared/custom_layers.py:85-132) and cv2 (what degrade_image uses,
shared/pipeline.py:79-94). Both run on CPU here purely as golden references.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from adunet.ops import resize, resize_by_scale, resize_to_match, degrade, scaled_size

cv2 = pytest.importorskip("cv2")
tf = pytest.importorskip("tensorflow")


def _rand_img(h, w, c=3, seed=0):
    rng = np.random.default_rng(seed)
    return rng.random((h, w, c), dtype=np.float32)


@pytest.mark.parametrize("scale", [0.2, 0.3, 0.45, 0.5, 0.6, 0.8, 0.9])
def test_bilinear_antialias_downsample_matches_tf(scale):
    img = _rand_img(64, 64)
    nh, nw = scaled_size(64, scale), scaled_size(64, scale)
    ours = np.asarray(resize(jnp.asarray(img)[None], (nh, nw), "bilinear", antialias=True))[0]
    theirs = tf.image.resize(img[None], [nh, nw], method="bilinear", antialias=True).numpy()[0]
    np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("out_size", [37, 64, 96, 200])
def test_bilinear_upsample_matches_tf(out_size):
    img = _rand_img(32, 32)
    ours = np.asarray(resize(jnp.asarray(img)[None], (out_size, out_size), "bilinear", True))[0]
    theirs = tf.image.resize(img[None], [out_size, out_size], method="bilinear", antialias=True).numpy()[0]
    np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=1e-5)


def test_nonsquare_and_batched():
    img = _rand_img(48, 80)
    batch = np.stack([img, img[::-1]], axis=0)
    ours = np.asarray(resize(jnp.asarray(batch), (31, 53), "bilinear", True))
    theirs = tf.image.resize(batch, [31, 53], method="bilinear", antialias=True).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("scale", [0.25, 0.5, 0.33, 0.77])
def test_area_downsample_matches_cv2(scale):
    img = _rand_img(64, 64)
    dn = max(1, int(round(64 * scale)))
    ours = np.asarray(resize(jnp.asarray(img)[None], (dn, dn), "area")[0])
    theirs = cv2.resize(img, (dn, dn), interpolation=cv2.INTER_AREA)
    np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("in_size,out_size", [(16, 64), (32, 64), (13, 64), (32, 100)])
def test_cubic_upsample_matches_cv2(in_size, out_size):
    img = _rand_img(in_size, in_size)
    ours = np.asarray(resize(jnp.asarray(img)[None], (out_size, out_size), "bicubic_cv2", antialias=False)[0])
    theirs = cv2.resize(img, (out_size, out_size), interpolation=cv2.INTER_CUBIC)
    np.testing.assert_allclose(ours, theirs, atol=5e-5, rtol=1e-4)


def test_bicubic_tf_matches_tf():
    img = _rand_img(32, 32)
    ours = np.asarray(resize(jnp.asarray(img)[None], (64, 64), "bicubic", antialias=False)[0])
    theirs = tf.image.resize(img[None], [64, 64], method="bicubic", antialias=False).numpy()[0]
    np.testing.assert_allclose(ours, theirs, atol=5e-5, rtol=1e-4)


@pytest.mark.parametrize("scale,size", [(0.5, 64), (0.3, 48), (0.8, 96)])
def test_degrade_matches_reference_cv2_path(scale, size):
    """degrade == cv2 INTER_AREA down + INTER_CUBIC up (shared/pipeline.py:79-94)."""
    img = _rand_img(size, size, seed=7)
    ours = np.asarray(degrade(jnp.asarray(img)[None], scale, size)[0])

    hr = np.clip(img, 0.0, 1.0)
    down = max(1, int(round(size * scale)))
    ref_dn = cv2.resize(hr, (down, down), interpolation=cv2.INTER_AREA)
    ref = cv2.resize(ref_dn, (size, size), interpolation=cv2.INTER_CUBIC)
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


def test_resize_by_scale_shape_and_dtype():
    img = jnp.asarray(_rand_img(64, 64)).astype(jnp.bfloat16)[None]
    out = resize_by_scale(img, 0.3)
    assert out.shape == (1, scaled_size(64, 0.3), scaled_size(64, 0.3), 3)
    assert out.dtype == jnp.bfloat16  # layer preserves dtype (custom_layers.py:94,103)


def test_resize_to_match_shape():
    x = jnp.asarray(_rand_img(20, 20))[None]
    ref = jnp.zeros((1, 55, 47, 8))
    out = resize_to_match(x, ref)
    assert out.shape == (1, 55, 47, 3)


def test_nearest_matches_tf():
    img = _rand_img(33, 33, c=1)
    ours = np.asarray(resize(jnp.asarray(img)[None], (64, 64), "nearest")[0])
    theirs = tf.image.resize(img[None], [64, 64], method="nearest").numpy()[0]
    np.testing.assert_allclose(ours, theirs, atol=0, rtol=0)


@pytest.mark.parametrize("out_size", [32, 100, 256])
def test_area_matches_tf_area(out_size):
    """Seg loader resizes with TF AREA (Segmenation/code/train_adaptive_unet.py:142)."""
    img = _rand_img(64, 64)
    ours = np.asarray(resize(jnp.asarray(img)[None], (out_size, out_size), "area")[0])
    theirs = tf.image.resize(img[None], [out_size, out_size], method="area").numpy()[0]
    np.testing.assert_allclose(ours, theirs, atol=3e-5, rtol=1e-4)


def test_resize_fuzz_random_shapes_vs_oracles():
    """Randomized sweep: 60 (in_shape, out_shape, method) combos against the
    TF / cv2 oracles. The parameterized tests above pin the shapes the
    pipelines actually use; this guards the kernel-synthesis math (box
    overlap, support windows, ragged edges) across arbitrary shapes —
    including extreme aspect ratios and 1px edges no pipeline hits today."""
    rng = np.random.default_rng(2026)
    checked = 0
    for case in range(60):
        h, w = int(rng.integers(3, 90)), int(rng.integers(3, 90))
        nh, nw = int(rng.integers(1, 90)), int(rng.integers(1, 90))
        img = rng.random((h, w, 3), dtype=np.float32)
        kind = case % 3
        if kind == 0:  # bilinear+antialias: ResizeByScale/ToMatch path
            ours = np.asarray(resize(jnp.asarray(img)[None], (nh, nw), "bilinear", antialias=True))[0]
            ref = tf.image.resize(img[None], [nh, nw], method="bilinear", antialias=True).numpy()[0]
            np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4,
                                       err_msg=f"bilinear {h}x{w}->{nh}x{nw}")
        elif kind == 1:  # AREA: degrade's downsample / seg loader resize
            ours = np.asarray(resize(jnp.asarray(img)[None], (nh, nw), "area"))[0]
            ref = tf.image.resize(img[None], [nh, nw], method="area").numpy()[0]
            np.testing.assert_allclose(ours, ref, atol=3e-5, rtol=2e-4,
                                       err_msg=f"area {h}x{w}->{nh}x{nw}")
        else:  # cv2 INTER_CUBIC upsample: degrade's second leg (upscale only)
            nh2, nw2 = max(nh, h), max(nw, w)
            ours = np.asarray(resize(jnp.asarray(img)[None], (nh2, nw2), "bicubic_cv2", antialias=False))[0]
            ref = cv2.resize(img, (nw2, nh2), interpolation=cv2.INTER_CUBIC)
            np.testing.assert_allclose(ours, ref, atol=3e-5, rtol=2e-4,
                                       err_msg=f"cubic {h}x{w}->{nh2}x{nw2}")
        checked += 1
    assert checked == 60


def test_degrade_fuzz_random_scales_vs_cv2_chain():
    """Randomized degrade parity: the fused on-device AREA-down + CUBIC-up
    chain vs the reference's two cv2 calls (shared/pipeline.py:79-94) over
    random (size, scale) combos beyond the three pinned ones."""
    rng = np.random.default_rng(11)
    for _ in range(15):
        size = int(rng.integers(24, 160))
        scale = float(rng.uniform(0.15, 0.95))
        img = rng.random((size, size, 3), dtype=np.float32)
        ours = np.asarray(degrade(jnp.asarray(img)[None], scale, size)[0])
        down = max(1, int(round(size * scale)))
        ref_dn = cv2.resize(img, (down, down), interpolation=cv2.INTER_AREA)
        ref = cv2.resize(ref_dn, (size, size), interpolation=cv2.INTER_CUBIC)
        np.testing.assert_allclose(ours, ref, atol=5e-5, rtol=2e-4,
                                   err_msg=f"degrade size={size} scale={scale:.3f}")
