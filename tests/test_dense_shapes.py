"""DenseShapesDataset: the 80-class / >MASK_TOP_K-instances quality fixture."""

import numpy as np

from mask_yolo_tpu.config import CocoStyleConfig
from mask_yolo_tpu.data.dense_shapes import DenseShapesDataset


def _make(count=6, seed=3, hw=(416, 416)):
    d = DenseShapesDataset()
    d.load_dense(count, hw[0], hw[1], seed=seed)
    d.prepare()
    return d


def test_dense_shapes_class_space():
    d = _make()
    assert d.num_classes == 81  # BG + 80
    all_ids = np.concatenate([d.load_mask(i)[1] for i in d.image_ids])
    assert all_ids.min() >= 1 and all_ids.max() <= 80
    assert len(np.unique(all_ids)) > 20  # classes actually spread


def test_dense_shapes_instance_density():
    d = _make(count=8, seed=1)
    counts = [d.load_mask(i)[0].shape[-1] for i in d.image_ids]
    # dense scenes approach the MASK_TOP_K cap (the r5 A/B raised the
    # default 32 → 48 after measuring −0.060 mask AP50 at 32 on exactly
    # these densities; occlusion pruning keeps drawn counts ≤ 48, so the
    # fixture stresses the old default and sits at the new cap's boundary)
    assert max(counts) > 32
    assert max(counts) <= 48 and CocoStyleConfig.MASK_TOP_K == 48
    assert min(counts) >= 10


def test_dense_shapes_deterministic():
    a, b = _make(3, seed=5), _make(3, seed=5)
    for i in a.image_ids:
        np.testing.assert_array_equal(a.load_image(i), b.load_image(i))
        ma, ia = a.load_mask(i)
        mb, ib = b.load_mask(i)
        np.testing.assert_array_equal(ma, mb)
        np.testing.assert_array_equal(ia, ib)


def test_dense_shapes_class_is_learnable_from_pixels():
    """The class must be derivable from shape+color of the visible mask —
    check the color octant of the dominant mask pixels maps back."""
    d = _make(2, seed=7)
    img = d.load_image(0)
    masks, ids = d.load_mask(0)
    info = d.image_info[0]
    vis = [s for s in info["shapes"]]
    # spot-check a handful of instances whose mask survived occlusion
    checked = 0
    for i in range(masks.shape[-1]):
        m = masks[..., i]
        if m.sum() < 30:
            continue
        mean_color = img[m].mean(axis=0)
        # mask interior is the fill color unless occluded; match an original
        # spec with that color and confirm the id
        for shape, color, _ in vis:
            if np.abs(mean_color - color).max() < 30:
                if d.class_of(shape, color) == ids[i]:
                    checked += 1
                    break
    assert checked >= 3


def test_dense_shapes_encodes_with_coco_config():
    from mask_yolo_tpu.data.encoder import encode_batch
    from mask_yolo_tpu.data.loader import load_image_gt

    cfg = CocoStyleConfig()
    d = _make(2, seed=2)
    g = cfg.MAX_GT_INSTANCES
    boxes = np.zeros((2, g, 4), np.float32)
    ids = np.zeros((2, g), np.int32)
    for i in d.image_ids:
        _, cls, bx, _ = load_image_gt(d, cfg, i)
        k = min(len(cls), g)
        boxes[i, :k] = bx[:k]
        ids[i, :k] = cls[:k]
    t, tb = encode_batch(boxes, ids, cfg)
    assert t.shape == (2, 13, 13, 5, 5 + 81)
    assert t[..., 4].sum() > 20  # dense scenes → many responsible anchors


def test_textured_mode_preserves_gt_geometry():
    """textured=True (the r4 photographic-complexity fixture) changes ONLY
    pixel appearance: masks, class ids, and boxes are identical to the flat
    renderer's for the same seed."""
    import numpy as np

    from mask_yolo_tpu.data.dense_shapes import DenseShapesDataset

    flat = DenseShapesDataset()
    flat.load_dense(4, 128, 128, seed=5, num_classes=8, min_instances=4,
                    max_instances=8)
    flat.prepare()
    tex = DenseShapesDataset()
    tex.load_dense(4, 128, 128, seed=5, num_classes=8, min_instances=4,
                   max_instances=8, textured=True)
    tex.prepare()

    for i in flat.image_ids:
        m_f, c_f = flat.load_mask(i)
        m_t, c_t = tex.load_mask(i)
        np.testing.assert_array_equal(m_f, m_t)
        np.testing.assert_array_equal(c_f, c_t)
        # the images genuinely differ (texture/clutter/lighting applied)
        assert not np.array_equal(flat.load_image(i), tex.load_image(i))


def test_textured_mode_is_deterministic_and_textured():
    import numpy as np

    from mask_yolo_tpu.data.dense_shapes import DenseShapesDataset

    a = DenseShapesDataset()
    a.load_dense(2, 128, 128, seed=9, num_classes=8, textured=True,
                 min_instances=4, max_instances=8)
    a.prepare()
    b = DenseShapesDataset()
    b.load_dense(2, 128, 128, seed=9, num_classes=8, textured=True,
                 min_instances=4, max_instances=8)
    b.prepare()
    for i in a.image_ids:
        img_a, img_b = a.load_image(i), b.load_image(i)
        np.testing.assert_array_equal(img_a, img_b)
        assert img_a.dtype == np.uint8

        # class evidence is no longer a flat fill: within-instance pixel
        # variance must be substantial (texture + gradient + lighting)
        mask, _ = a.load_mask(i)
        inst = mask[:, :, 0]
        if inst.sum() > 50:
            px = img_a[inst].astype(np.float32)
            assert px.std(axis=0).mean() > 2.0, "instance looks flat"


def test_textured_class_signal_survives():
    """The palette class remains decodable from the MEAN instance color
    under texture/lighting — the fixture is harder, not unlearnable."""
    import numpy as np

    from mask_yolo_tpu.data.dense_shapes import DenseShapesDataset

    ds = DenseShapesDataset()
    ds.load_dense(6, 160, 160, seed=3, num_classes=16, textured=True,
                  min_instances=5, max_instances=10)
    ds.prepare()
    hits = total = 0
    for i in ds.image_ids:
        img = ds.load_image(i).astype(np.float32)
        mask, class_ids = ds.load_mask(i)
        for j, cid in enumerate(class_ids):
            inst = mask[:, :, j]
            if inst.sum() < 60:
                continue
            mean = img[inst].mean(axis=0)
            d = np.abs(ds._palette.astype(np.float32) - mean).sum(axis=1)
            total += 1
            hits += int(1 + int(np.argmin(d)) == int(cid))
    assert total >= 20
    # lighting gain shifts colors, so demand "mostly right", not perfect
    assert hits / total > 0.6, f"class signal too weak: {hits}/{total}"
