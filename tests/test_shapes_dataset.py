import numpy as np

from mask_yolo_tpu.data.loader import extract_bboxes, load_image_gt, pack_gt
from mask_yolo_tpu.data.shapes import ShapesConfig, ShapesDataset


def make_ds(n=8, seed=0, size=224):
    ds = ShapesDataset()
    ds.load_shapes(n, size, size, seed=seed)
    ds.prepare()
    return ds


def test_deterministic_given_seed():
    a, b = make_ds(seed=7), make_ds(seed=7)
    for i in range(len(a.image_ids)):
        assert np.array_equal(a.load_image(i), b.load_image(i))
        ma, ca = a.load_mask(i)
        mb, cb = b.load_mask(i)
        assert np.array_equal(ma, mb) and np.array_equal(ca, cb)


def test_different_seed_differs():
    a, b = make_ds(seed=1), make_ds(seed=2)
    assert not all(
        np.array_equal(a.load_image(i), b.load_image(i)) for i in range(8)
    )


def test_masks_match_image_shapes():
    ds = make_ds()
    for i in ds.image_ids:
        img = ds.load_image(i)
        masks, cids = ds.load_mask(i)
        assert img.shape == (224, 224, 3) and img.dtype == np.uint8
        assert masks.shape[:2] == (224, 224)
        assert masks.shape[2] == cids.shape[0] >= 1
        assert set(np.unique(cids)).issubset({1, 2, 3})


def test_occlusion_masks_disjoint():
    ds = make_ds(n=16, seed=3)
    for i in ds.image_ids:
        masks, _ = ds.load_mask(i)
        overlap = masks.astype(np.int32).sum(axis=-1)
        assert overlap.max() <= 1  # occlusion handling makes instances disjoint


def test_extract_bboxes_simple():
    m = np.zeros((10, 10, 2), dtype=bool)
    m[2:5, 3:7, 0] = True  # y 2..4, x 3..6
    boxes = extract_bboxes(m)
    # (x1, y1, x2, y2) with exclusive max (reference myolo_utils.py:262-264)
    assert boxes[0].tolist() == [3, 2, 7, 5]
    assert boxes[1].tolist() == [0, 0, 0, 0]  # empty instance → zero box


def test_load_image_gt_and_pack(tiny_config):
    ds = ShapesDataset()
    ds.load_shapes(4, 64, 64, seed=0)
    ds.prepare()
    img, cids, boxes, masks = load_image_gt(ds, tiny_config, 0)
    assert img.shape == (64, 64, 3)
    assert boxes.shape == (cids.shape[0], 4)
    ids, bxs, msks = pack_gt(cids, boxes, masks, tiny_config)
    g = tiny_config.MAX_GT_INSTANCES
    assert ids.shape == (g,) and bxs.shape == (g, 4)
    assert msks.shape == (64, 64, g)
    # boxes actually bound the masks
    for i in range(cids.shape[0]):
        x1, y1, x2, y2 = boxes[i]
        sub = masks[y1:y2, x1:x2, i]
        assert sub.any()
        assert not masks[:y1, :, i].any() and not masks[y2:, :, i].any()
        assert not masks[:, :x1, i].any() and not masks[:, x2:, i].any()
