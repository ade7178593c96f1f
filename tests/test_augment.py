"""Tests for the seeded mask-safe augmentation pipeline (data/augment.py)
and the seeded flip in load_image_gt — the augmentation-parity surface of the
reference's imgaug integration (/root/reference/myolo/myolo_utils.py:306-343).
"""

import numpy as np

from mask_yolo_tpu.data import augment
from mask_yolo_tpu.data.shapes import ShapesConfig, ShapesDataset


def _sample(seed=3):
    rng = np.random.RandomState(seed)
    image = rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
    mask = np.zeros((32, 32, 2), bool)
    mask[4:12, 6:18, 0] = True
    mask[20:30, 2:10, 1] = True
    return image, mask


def test_fliplr_applies_to_both():
    image, mask = _sample()
    op = augment.Fliplr(p=1.0)
    img2, msk2 = op(image, mask, np.random.RandomState(0))
    np.testing.assert_array_equal(img2, np.fliplr(image))
    np.testing.assert_array_equal(msk2, np.fliplr(mask))


def test_rot90_geometric_consistency():
    image, mask = _sample()
    op = augment.Rot90(ks=(1,))
    img2, msk2 = op(image, mask, np.random.RandomState(0))
    np.testing.assert_array_equal(img2, np.rot90(image, 1, axes=(0, 1)))
    np.testing.assert_array_equal(msk2, np.rot90(mask, 1, axes=(0, 1)))


def test_rot90_nonsquare_restricted_to_half_turns():
    rng = np.random.RandomState(0)
    image = rng.randint(0, 255, (16, 32, 3), dtype=np.uint8)
    mask = np.zeros((16, 32, 1), bool)
    op = augment.Rot90(ks=(1, 3))  # only odd ks requested → falls back to 0
    img2, msk2 = op(image, mask, np.random.RandomState(0))
    assert img2.shape == image.shape and msk2.shape == mask.shape


def test_scale_keeps_shape_and_dtype():
    image, mask = _sample()
    for s in (0.8, 1.25):
        op = augment.Scale((s, s))
        img2, msk2 = op(image, mask, np.random.RandomState(0))
        assert img2.shape == image.shape and img2.dtype == np.uint8
        assert msk2.shape == mask.shape and msk2.dtype == bool
        # mask survives (the object is central enough not to crop away)
        assert msk2.any()


def test_photometric_ops_leave_mask_alone():
    image, mask = _sample()
    for op in (augment.Brightness((0.5, 0.5)), augment.Contrast((1.5, 1.5))):
        img2, msk2 = op(image, mask, np.random.RandomState(0))
        np.testing.assert_array_equal(msk2, mask)
        assert not np.array_equal(img2, image)
        assert img2.dtype == np.uint8


def test_sequential_seeded_reproducible_and_resampling():
    image, mask = _sample()
    a = augment.default_augmenter(seed=11)
    b = augment.default_augmenter(seed=11)
    # same seed → identical stream call by call
    for _ in range(3):
        ia, ma = a(image, mask)
        ib, mb = b(image, mask)
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(ma, mb)
    # fresh resampling between calls: over 8 draws at least two distinct
    # outputs (flip/rot90 alone give 8 geometric variants)
    outs = {a(image, mask)[0].tobytes() for _ in range(8)}
    assert len(outs) >= 2


def test_affects_mask_flag():
    assert augment.Fliplr().affects_mask
    assert augment.Scale().affects_mask
    assert not augment.Brightness().affects_mask
    assert augment.Sequential([augment.Brightness()]).affects_mask is False
    assert augment.Sequential(
        [augment.Brightness(), augment.Fliplr()]).affects_mask is True


def test_load_image_gt_flip_is_seeded():
    from mask_yolo_tpu.data.loader import load_image_gt

    class SmallConfig(ShapesConfig):
        IMAGE_SHAPE = [64, 64, 3]
        IMAGE_MIN_DIM = 64
        IMAGE_MAX_DIM = 64
        GRID_H, GRID_W = 2, 2

    cfg = SmallConfig()
    ds = ShapesDataset()
    ds.load_shapes(4, 64, 64, seed=0)
    ds.prepare()

    a = [load_image_gt(ds, cfg, i, augment=True,
                       rng=np.random.RandomState(9)) for i in range(4)]
    b = [load_image_gt(ds, cfg, i, augment=True,
                       rng=np.random.RandomState(9)) for i in range(4)]
    for (ia, ca, ba, ma), (ib, cb, bb, mb) in zip(a, b):
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(ba, bb)
        np.testing.assert_array_equal(ma, mb)


def test_augmented_gt_boxes_match_masks():
    """Boxes are re-extracted AFTER augmentation, so they must tightly bound
    the augmented masks."""
    from mask_yolo_tpu.data.loader import extract_bboxes, load_image_gt

    class SmallConfig(ShapesConfig):
        IMAGE_SHAPE = [64, 64, 3]
        IMAGE_MIN_DIM = 64
        IMAGE_MAX_DIM = 64
        GRID_H, GRID_W = 2, 2

    cfg = SmallConfig()
    ds = ShapesDataset()
    ds.load_shapes(6, 64, 64, seed=1)
    ds.prepare()
    aug = augment.default_augmenter(seed=2)
    for i in range(6):
        _, cids, boxes, masks = load_image_gt(ds, cfg, i, augmentation=aug,
                                              use_mini_mask=False)
        np.testing.assert_array_equal(boxes, extract_bboxes(masks))
        assert cids.shape[0] == masks.shape[-1]


def test_batchgen_norm_false_debug_mode():
    """BatchGenerator(norm=False) emits 0..255 images with GT boxes drawn
    (reference myolo_utils.py:826-840)."""
    from mask_yolo_tpu.data.pipeline import BatchGenerator, preload_dataset

    class SmallConfig(ShapesConfig):
        IMAGE_SHAPE = [64, 64, 3]
        IMAGE_MIN_DIM = 64
        IMAGE_MAX_DIM = 64
        GRID_H, GRID_W = 2, 2
        BATCH_SIZE = 4

    cfg = SmallConfig()
    ds = ShapesDataset()
    ds.load_shapes(4, 64, 64, seed=2)
    ds.prepare()
    data = preload_dataset(ds, cfg)
    normed = BatchGenerator(data, cfg, mode="training", shuffle=False)[0]
    debug = BatchGenerator(data, cfg, mode="training", shuffle=False,
                           norm=False)[0]
    assert debug["image"].max() > 1.5          # 0..255 scale
    # identical except where boxes were painted
    diff = np.abs(debug["image"]
                  - normed["image"].astype(np.float32)).max(axis=-1) > 0.5
    assert diff.any()                           # boxes drawn
    assert diff.mean() < 0.5                    # ...but most pixels untouched
    # targets are unaffected by the debug overlay
    np.testing.assert_array_equal(debug["yolo_target"], normed["yolo_target"])


def test_data_generator_norm_false():
    from mask_yolo_tpu.data.pipeline import data_generator

    class SmallConfig(ShapesConfig):
        IMAGE_SHAPE = [64, 64, 3]
        IMAGE_MIN_DIM = 64
        IMAGE_MAX_DIM = 64
        GRID_H, GRID_W = 2, 2
        BATCH_SIZE = 2

    cfg = SmallConfig()
    ds = ShapesDataset()
    ds.load_shapes(4, 64, 64, seed=2)
    ds.prepare()
    batch = next(data_generator(ds, cfg, shuffle=False, norm=False))
    assert batch["image"].max() > 1.5
