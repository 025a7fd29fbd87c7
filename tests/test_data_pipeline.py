"""Data-layer tests incl. real PNG decode path and pipeline semantics."""

import numpy as np
import pytest

import jax.numpy as jnp

from adunet.data import (
    GridPatchDataset,
    TrainingPatchDataset,
    collect_isic_pairs,
    discover_pairs,
    find_images,
    grid_patches,
    load_rgb_image_full,
    random_patches,
)

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def png_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("png_data")
    rng = np.random.default_rng(0)
    for i in range(4):
        img = (rng.random((80, 96, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(root / f"im{i}.png"), img[..., ::-1])  # BGR write
    return root


def test_png_roundtrip_loader(png_dataset):
    files = find_images(png_dataset, ".png")
    assert len(files) == 4
    img = load_rgb_image_full(files[0])
    assert img.shape == (80, 96, 3) and img.dtype == np.float32
    assert 0.0 <= img.min() and img.max() <= 1.0


def test_training_patch_dataset_stream(png_dataset):
    files = find_images(png_dataset, ".png")
    ds = TrainingPatchDataset(
        files, patch_size=32, patches_per_image=2, scale=0.5,
        batch_size=4, seed=3, shuffle_buffer=8,
    )
    assert ds.total_patches == 8
    it = iter(ds)
    batches = [next(it) for _ in range(3)]  # infinite stream keeps going
    for b in batches:
        assert b.shape == (4, 32, 32, 3)
        assert b.dtype == np.float32


def test_grid_dataset_labels_and_tiling(png_dataset):
    files = find_images(png_dataset, ".png")
    ds = GridPatchDataset(files, patch_size=32, scale=0.5, batch_size=3, stride=32)
    # 80x96 with 32 stride: rows 0,32 (48 doesn't fit) x cols 0,32,64 -> 6/img
    assert ds.total_patches == 24
    assert ds.patch_labels[0].endswith("#patch0000")
    total = sum(b.shape[0] for b in ds)
    assert total == 24


def test_grid_patches_fallback_patch():
    img = np.random.default_rng(0).random((40, 40, 3)).astype(np.float32)
    tiles = grid_patches(img, 32, stride=64)
    assert tiles.shape[0] == 1  # stride skips -> bottom-right fallback


def test_grid_patch_count_matches_tiling():
    from adunet.data import grid_patch_count

    rng = np.random.default_rng(1)
    for h, w, p, s in [(80, 96, 32, 32), (64, 64, 32, 16), (33, 47, 32, 32),
                       (256, 256, 64, 48), (100, 40, 40, 7)]:
        img = rng.random((h, w, 3)).astype(np.float32)
        assert grid_patch_count(h, w, p, stride=s) == grid_patches(img, p, stride=s).shape[0], (
            h, w, p, s)


def _reference_grid_oracle(image, patch_size, stride, drop_remainder):
    """Verbatim re-statement of the reference tiling algorithm
    (shared/pipeline.py:139-174) including its bottom-right fallback branch.
    Returns (patches, fallback_fired)."""
    height, width = image.shape[:2]
    patches = []
    for top in range(0, height - patch_size + 1, stride):
        for left in range(0, width - patch_size + 1, stride):
            patches.append(image[top:top + patch_size, left:left + patch_size, :])
    fallback = False
    if not patches and not drop_remainder:
        fallback = True
        patches.append(image[-patch_size:, -patch_size:, :])
    if patches:
        return np.stack(patches, axis=0), fallback
    return np.empty((0, patch_size, patch_size, 3), dtype=image.dtype), fallback


def test_grid_tiling_matches_reference_oracle_exhaustive():
    """VERDICT r2 #10: brute-force the reference's edge semantics.

    Sweeps every (h, w, patch, stride) combination in a window that covers
    stride > patch, stride > image extent, exact-fit, and off-by-one tails,
    asserting (a) bit-identical tiles vs the reference algorithm, (b) the
    bottom-right fallback is genuinely unreachable whenever the patch fits
    (so dropping the branch is a proof, not a narrowing), and (c)
    drop_remainder never changes the output.
    """
    rng = np.random.default_rng(7)
    fallback_seen = False
    checked = 0
    for p in (1, 3, 5):
        for h in range(p, p + 9):
            for w in range(p, p + 9):
                img = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
                for s in range(1, 2 * p + 6):
                    want, fired = _reference_grid_oracle(img, p, s, False)
                    want_drop, fired_drop = _reference_grid_oracle(img, p, s, True)
                    fallback_seen |= fired or fired_drop
                    got = grid_patches(img, p, stride=s)
                    np.testing.assert_array_equal(got, want)
                    np.testing.assert_array_equal(
                        grid_patches(img, p, stride=s, drop_remainder=True), want_drop
                    )
                    from adunet.data import grid_patch_count
                    assert grid_patch_count(h, w, p, stride=s) == want.shape[0]
                    checked += 1
    assert checked > 1000
    assert not fallback_seen, "reference fallback fired — closed-form count is wrong"


def test_random_patch_rng_stream_parity():
    """The pinned RNG contract: y drawn before x, each via integers(0, span+1),
    each skipped when that axis has zero slack (shared/pipeline.py:113-118)."""
    from adunet.data import random_patch

    def oracle(image, p, gen):
        h, w = image.shape[:2]
        my, mx = h - p, w - p
        top = int(gen.integers(0, my + 1)) if my > 0 else 0
        left = int(gen.integers(0, mx + 1)) if mx > 0 else 0
        return image[top:top + p, left:left + p, :]

    base = np.random.default_rng(3).random((41, 57, 3)).astype(np.float32)
    for h, w, p in [(41, 57, 16), (16, 57, 16), (41, 16, 16), (16, 16, 16), (41, 57, 1)]:
        img = base[:h, :w]
        a = np.random.default_rng(99)
        b = np.random.default_rng(99)
        for _ in range(20):
            np.testing.assert_array_equal(
                random_patch(img, p, rng=a), oracle(img, p, b)
            )
        # Streams must stay aligned after interleaved draws too.
        assert a.integers(0, 1 << 30) == b.integers(0, 1 << 30)


def test_read_image_size_header_only(png_dataset, tmp_path):
    from adunet.data import read_image_size

    files = find_images(png_dataset, ".png")
    assert read_image_size(files[0]) == (80, 96)
    np.save(tmp_path / "a.npy", np.zeros((17, 23, 3), np.float32))
    assert read_image_size(tmp_path / "a.npy") == (17, 23)


def test_pair_lr_files(tmp_path):
    from adunet.data import pair_lr_files

    hr_dir = tmp_path / "hr"
    lr_dir = tmp_path / "lr"
    hr_dir.mkdir()
    lr_dir.mkdir()
    hr = []
    for i in range(3):
        p = hr_dir / f"im{i}.npy"
        np.save(p, np.zeros((8, 8, 3), np.float32))
        hr.append(str(p))
        np.save(lr_dir / f"im{i}.npy", np.zeros((8, 8, 3), np.float32))
    lr = pair_lr_files(hr, lr_dir)
    assert [p.split("/")[-1] for p in lr] == ["im0.npy", "im1.npy", "im2.npy"]

    (lr_dir / "im1.npy").unlink()
    with pytest.raises(ValueError, match="Missing 1 LR"):
        pair_lr_files(hr, lr_dir)


def test_isic_pair_discovery_errors(tmp_path):
    (tmp_path / "img").mkdir()
    (tmp_path / "mask").mkdir()
    np.save(tmp_path / "img" / "isic_0001.npy", np.zeros((4, 4, 3), np.float32))
    np.save(tmp_path / "img" / "isic_0001_superpixels.npy", np.zeros((4, 4, 3), np.float32))
    np.save(tmp_path / "mask" / "isic_0001_segmentation.npy", np.zeros((4, 4), np.float32))
    pairs = collect_isic_pairs(tmp_path / "img", tmp_path / "mask")
    assert len(pairs) == 1  # superpixels filtered

    np.save(tmp_path / "img" / "isic_0002.npy", np.zeros((4, 4, 3), np.float32))
    with pytest.raises(ValueError, match="Missing 1 segmentation masks"):
        collect_isic_pairs(tmp_path / "img", tmp_path / "mask")


def test_generic_pair_discovery_cityscapes_suffixes(tmp_path):
    (tmp_path / "img").mkdir()
    (tmp_path / "mask").mkdir()
    np.save(tmp_path / "img" / "city_000_leftimg8bit.npy", np.zeros((4, 4, 3), np.float32))
    np.save(tmp_path / "mask" / "city_000_gtfine_labelids.npy", np.zeros((4, 4), np.float32))
    pairs = discover_pairs(tmp_path / "img", tmp_path / "mask", ".npy", ".npy")
    assert len(pairs) == 1


def test_augment_preserves_mask_binarity():
    import jax

    from adunet.data import augment_pair_batch

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((4, 32, 32, 3), dtype=np.float32))
    masks = jnp.asarray((rng.random((4, 32, 32, 1)) > 0.5).astype(np.float32))
    out_img, out_mask = jax.jit(augment_pair_batch)(images, masks, jax.random.key(0))
    assert out_img.shape == images.shape
    vals = np.unique(np.asarray(out_mask))
    assert set(vals.tolist()) <= {0.0, 1.0}


def test_augment_identity_when_no_jitter():
    """With scale range [1,1] and a key whose rot/flips are no-ops the crop
    math must be the identity resample."""
    import jax

    from adunet.data.augment import random_resized_crop_pair

    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.random((16, 16, 3), dtype=np.float32))
    mask = jnp.asarray((rng.random((16, 16, 1)) > 0.5).astype(np.float32))
    out_img, out_mask = random_resized_crop_pair(img, mask, jax.random.key(0), 1.0, 1.0)
    np.testing.assert_allclose(np.asarray(out_img), np.asarray(img), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_mask), np.asarray(mask), atol=0)


def test_scale_jitter_crop_matches_tf_resize_then_crop():
    """The coordinate-sampling augment equals tf resize(bilinear)+crop for a
    fixed jitter size and offset (the dynamic-shape path it replaces)."""
    tf = pytest.importorskip("tensorflow")
    import jax

    from adunet.data.augment import _linear_gather

    rng = np.random.default_rng(2)
    size, scaled, oy, ox = 16, 18, 1, 2
    img = rng.random((size, size, 3), dtype=np.float32)

    idx = jnp.arange(size, dtype=jnp.float32)
    ratio = size / scaled
    ys = (oy + idx + 0.5) * ratio - 0.5
    xs = (ox + idx + 0.5) * ratio - 0.5
    ours = np.asarray(_linear_gather(_linear_gather(jnp.asarray(img), ys, 0), xs, 1))

    resized = tf.image.resize(img[None], [scaled, scaled], method="bilinear").numpy()[0]
    theirs = resized[oy : oy + size, ox : ox + size]
    np.testing.assert_allclose(ours, theirs, atol=2e-6)


def test_training_patch_dataset_uint8_wire_format(png_dataset):
    from adunet.data import TrainingPatchDataset

    files = find_images(png_dataset, ".png")
    ds = TrainingPatchDataset(
        files, patch_size=32, patches_per_image=2, scale=0.5,
        batch_size=4, seed=3, shuffle_buffer=8, output_dtype="uint8",
    )
    batch = next(iter(ds))
    assert batch.dtype == np.uint8
    assert batch.shape == (4, 32, 32, 3)
    assert batch.max() > 1  # actually uint8-scaled


def test_sr_step_normalises_uint8_on_device(png_dataset):
    """uint8 batches train identically to their f32/255 counterparts."""
    import jax
    import jax.numpy as jnp

    from adunet.losses import charbonnier_loss
    from adunet.models import build_super_resolution_unet
    from adunet.train import create_train_state, make_optimizer, make_sr_train_step

    model, _ = build_super_resolution_unet(
        scale=0.5, depth_override=1, input_size=32, base_channels=8,
        residual_head_channels=8,
    )
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((1, 32, 32, 3)), make_optimizer(1e-3)
    )
    rng = np.random.default_rng(0)
    u8 = (rng.random((4, 32, 32, 3)) * 255).astype(np.uint8)
    f32 = u8.astype(np.float32) / 255.0

    step = make_sr_train_step(model, charbonnier_loss, donate=False)
    _, m_u8 = step(state, jnp.asarray(u8), None)
    _, m_f32 = step(state, jnp.asarray(f32), None)
    assert float(m_u8["loss"]) == pytest.approx(float(m_f32["loss"]), rel=1e-6)


def test_device_cache_sampling():
    """On-device patch sampling: in-bounds crops, exact pixel provenance,
    [0,1] f32 output, rng-deterministic."""
    import jax

    from adunet.data import load_device_cache, sample_patch_batch

    rng_np = np.random.default_rng(0)
    import tempfile
    from pathlib import Path

    with tempfile.TemporaryDirectory() as tmp:
        host = []
        for i in range(3):
            img = (rng_np.random((24, 20, 3)) * 255).astype(np.uint8)
            np.save(Path(tmp) / f"i{i}.npy", img)
            host.append(img)
        paths = [str(Path(tmp) / f"i{i}.npy") for i in range(3)]
        cache = load_device_cache(paths)
    assert cache.shape == (3, 24, 20, 3) and cache.dtype == jnp.uint8

    batch = sample_patch_batch(cache, jax.random.key(7), batch_size=16, patch_size=8)
    assert batch.shape == (16, 8, 8, 3)
    arr = np.asarray(batch)
    assert arr.min() >= 0.0 and arr.max() <= 1.0

    # every sampled patch exists verbatim in one of the source images
    # (device normalises via x * (1/255) — match that arithmetic exactly)
    stacks = np.stack(host).astype(np.float32) * np.float32(1.0 / 255.0)
    for patch in arr[:4]:
        found = False
        for img in stacks:
            for y in range(24 - 8 + 1):
                for x in range(20 - 8 + 1):
                    if np.array_equal(img[y:y+8, x:x+8], patch):
                        found = True
        assert found

    # deterministic for a fixed key
    again = np.asarray(sample_patch_batch(cache, jax.random.key(7), 16, 8))
    np.testing.assert_array_equal(arr, again)

    # mixed sizes are rejected
    import pytest as _pytest
    with tempfile.TemporaryDirectory() as tmp:
        np.save(Path(tmp) / "a.npy", np.zeros((8, 8, 3), np.uint8))
        np.save(Path(tmp) / "b.npy", np.zeros((9, 8, 3), np.uint8))
        from adunet.data import load_device_cache as ldc
        with _pytest.raises(ValueError, match="uniform"):
            ldc([str(Path(tmp) / "a.npy"), str(Path(tmp) / "b.npy")])


def test_array_dataset_drop_remainder_contract():
    """drop_remainder must never emit a ragged batch (mesh-sharded consumers
    compile one static batch shape) and must be a loud error when even one
    full batch is impossible."""
    import pytest

    from adunet.data import ArrayDataset

    x = np.arange(10, dtype=np.float32).reshape(10, 1)
    ds = ArrayDataset(x, x, batch_size=4, shuffle=False, seed=0, drop_remainder=True)
    assert ds.steps_per_epoch == 2
    assert [b[0].shape[0] for b in ds] == [4, 4]  # ragged tail of 2 dropped

    ds2 = ArrayDataset(x, x, batch_size=4, shuffle=False, seed=0)
    assert [b[0].shape[0] for b in ds2] == [4, 4, 2]

    with pytest.raises(ValueError, match="drop_remainder"):
        ArrayDataset(x[:3], x[:3], batch_size=4, shuffle=False, seed=0,
                     drop_remainder=True)


def test_seg_pair_dataset_pad_tail():
    """pad_tail wrap-fills a ragged final batch to the compiled shape — the
    multi-device requirement (a tail that does not divide the data axis
    cannot shard); single-device keeps the reference's ragged semantics."""
    from pathlib import Path
    import tempfile

    from adunet.data.seg_pipeline import SegPairDataset

    with tempfile.TemporaryDirectory() as tmp:
        pairs = []
        for i in range(10):
            img = Path(tmp) / f"i{i}.npy"
            msk = Path(tmp) / f"i{i}_mask.npy"
            np.save(img, np.full((8, 8, 3), i / 10, np.float32))
            np.save(msk, np.zeros((8, 8), np.float32))
            pairs.append((str(img), str(msk)))

        ds = SegPairDataset(pairs, batch_size=8, image_size=8, augment=False,
                            shuffle=False, seed=0, pad_tail=True)
        batches = list(ds)
        assert [b[0].shape[0] for b in batches] == [8, 8]
        # the tail held 2 real samples (8, 9) then wrapped to the epoch start
        tail = batches[1][0][:, 0, 0, 0]
        np.testing.assert_allclose(tail[:2], [0.8, 0.9], atol=1e-6)
        np.testing.assert_allclose(tail[2:], np.arange(6) / 10, atol=1e-6)

        # fewer pairs than a batch: wrap cycles as often as needed
        ds2 = SegPairDataset(pairs[:3], batch_size=8, image_size=8, augment=False,
                             shuffle=False, seed=0, pad_tail=True)
        (b2,) = list(ds2)
        assert b2[0].shape[0] == 8


def test_load_rgb_image_linear_matches_tf_bilinear(tmp_path):
    """interp='linear' (vanilla seg parity) must match the reference's
    tf.image.resize BILINEAR (unet_vinillia.py:166) within float tolerance."""
    import pytest

    cv2 = pytest.importorskip("cv2")
    tf = pytest.importorskip("tensorflow")

    from adunet.data import load_rgb_image

    rng = np.random.default_rng(0)
    img_u8 = (rng.random((97, 123, 3)) * 255).astype(np.uint8)
    p = tmp_path / "img.png"
    cv2.imwrite(str(p), img_u8[..., ::-1])

    ours = load_rgb_image(p, 64, interp="linear")
    ref = tf.image.resize(
        tf.convert_to_tensor(img_u8, tf.float32), (64, 64),
        method=tf.image.ResizeMethod.BILINEAR,
    ).numpy() / 255.0
    np.testing.assert_allclose(ours, ref, atol=2e-2)  # cv2/tf tap rounding
    assert np.abs(ours - ref).mean() < 3e-3

    # default stays the shared loader's INTER_AREA
    area = load_rgb_image(p, 64)
    assert np.abs(area - ours).max() > 1e-3  # the two kernels genuinely differ


def test_scale_jitter_crop_fuzz_vs_tf():
    """Randomized sweep of the coordinate-sampling augment vs tf
    resize(bilinear)+crop over random (size, jitter, offset) combos —
    broadens the single fixed case above to the whole jitter range the
    protocol trainer samples from (scale in [1.0, 1.25])."""
    tf = pytest.importorskip("tensorflow")
    from adunet.data.augment import _linear_gather

    rng = np.random.default_rng(8)
    for _ in range(20):
        size = int(rng.integers(8, 64))
        scaled = int(rng.integers(size, int(size * 1.3) + 1))
        oy = int(rng.integers(0, scaled - size + 1))
        ox = int(rng.integers(0, scaled - size + 1))
        img = rng.random((size, size, 3), dtype=np.float32)

        idx = jnp.arange(size, dtype=jnp.float32)
        ratio = size / scaled
        ys = (oy + idx + 0.5) * ratio - 0.5
        xs = (ox + idx + 0.5) * ratio - 0.5
        ours = np.asarray(_linear_gather(_linear_gather(jnp.asarray(img), ys, 0), xs, 1))

        resized = tf.image.resize(img[None], [scaled, scaled], method="bilinear").numpy()[0]
        theirs = resized[oy : oy + size, ox : ox + size]
        np.testing.assert_allclose(
            ours, theirs, atol=3e-6,
            err_msg=f"jitter size={size} scaled={scaled} off=({oy},{ox})",
        )


def test_cache_decoded_stream_identical_and_decodes_once(png_dataset, monkeypatch):
    """cache_decoded must not change a single yielded byte, and must hit the
    decoder exactly once per file regardless of how many epoch passes the
    infinite stream makes."""
    import adunet.data.sr_pipeline as sp

    files = find_images(png_dataset, ".png")
    kwargs = dict(patch_size=32, patches_per_image=2, scale=0.5,
                  batch_size=4, seed=3, shuffle_buffer=8)
    # 4 files x 2 patches = 8/pass; 12 batches of 4 = 6 passes
    plain = TrainingPatchDataset(files, **kwargs)
    it = iter(plain)
    want = [next(it) for _ in range(12)]

    calls = []
    real = sp.load_rgb_image_full

    def counting_loader(path):
        calls.append(path)
        return real(path)

    monkeypatch.setattr(sp, "load_rgb_image_full", counting_loader)
    cached = TrainingPatchDataset(files, cache_decoded=True, **kwargs)
    it = iter(cached)
    got = [next(it) for _ in range(12)]

    for w, g in zip(want, got):
        np.testing.assert_array_equal(w, g)
    # single-threaded-consumer decode window may race the same file at most
    # once per worker on the first pass; with 4 files and 6 passes an
    # uncached loader would show >=24 calls
    assert len(calls) <= len(files) * 2
    assert set(calls) == set(str(f) for f in files)
    assert len(cached._decoded_cache) == len(files)


def test_seg_cache_decoded_identical_and_decodes_once(tmp_path, monkeypatch):
    """SegPairDataset(cache_decoded=True): identical batches across epochs,
    one decode per pair no matter how many epoch passes run."""
    import adunet.data.seg_pipeline as sp
    from adunet.data.seg_pipeline import SegPairDataset

    pairs = []
    rng = np.random.default_rng(7)
    for i in range(6):
        img, msk = tmp_path / f"i{i}.npy", tmp_path / f"i{i}_mask.npy"
        np.save(img, rng.random((8, 8, 3)).astype(np.float32))
        np.save(msk, (rng.random((8, 8)) > 0.5).astype(np.float32))
        pairs.append((str(img), str(msk)))

    kwargs = dict(batch_size=3, image_size=8, augment=False, shuffle=True, seed=0)
    plain = SegPairDataset(pairs, **kwargs)
    want = [list(plain) for _ in range(3)]  # 3 epoch passes, per-epoch shuffles

    calls = []
    real = sp.load_rgb_image

    def counting(path, size, interp="area"):
        calls.append(path)
        return real(path, size, interp=interp)

    monkeypatch.setattr(sp, "load_rgb_image", counting)
    cached = SegPairDataset(pairs, cache_decoded=True, **kwargs)
    got = [list(cached) for _ in range(3)]

    for epoch_w, epoch_g in zip(want, got):
        for (wi, wm), (gi, gm) in zip(epoch_w, epoch_g):
            np.testing.assert_array_equal(wi, gi)
            np.testing.assert_array_equal(wm, gm)
    # decode-window races may duplicate a first-pass decode; never 3 epochs' worth
    assert len(calls) <= len(pairs) * 2
    assert len(cached._decoded_cache) == len(pairs)
