"""VIA dataset loader + anchor k-means tests."""

import json
import os

import numpy as np
import pytest

from mask_yolo_tpu.data.via import ViaDataset, color_splash
from mask_yolo_tpu.utils.anchors import (boxes_to_wh, gen_anchors,
                                         kmeans_anchors, sweep_k,
                                         wh_iou_matrix)


@pytest.fixture()
def via_dir(tmp_path, rng):
    """Synthesize a tiny VIA dataset: 2 images with polygon annotations."""
    from PIL import Image

    d = tmp_path / "train"
    d.mkdir()
    ann = {}
    for i in range(2):
        name = f"img{i}.png"
        arr = (rng.rand(60, 80, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / name)
        # one triangle + one quad (VIA 2.x list format for img0, 1.x dict for img1)
        regions = [
            {"shape_attributes": {"name": "polygon",
                                  "all_points_x": [10, 40, 25],
                                  "all_points_y": [10, 12, 35]}},
            {"shape_attributes": {"name": "polygon",
                                  "all_points_x": [50, 70, 70, 50],
                                  "all_points_y": [20, 20, 50, 50]}},
        ]
        if i == 1:
            regions = {str(j): r for j, r in enumerate(regions)}
        ann[name] = {"filename": name, "regions": regions}
    # an unannotated entry that must be skipped
    ann["empty.png"] = {"filename": "empty.png", "regions": []}
    with open(d / "via_test_annotation.json", "w") as f:
        json.dump(ann, f)
    return str(tmp_path)


def test_via_dataset_loads(via_dir):
    ds = ViaDataset()
    ds.load_via(via_dir, "train")
    ds.prepare()
    assert ds.num_images == 2  # unannotated entry skipped
    assert ds.num_classes == 2  # BG + food
    for i in ds.image_ids:
        img = ds.load_image(i)
        masks, cids = ds.load_mask(i)
        assert img.shape == (60, 80, 3)
        assert masks.shape == (60, 80, 2)
        assert masks[:, :, 0].sum() > 50  # triangle filled
        assert masks[:, :, 1].sum() > 500  # quad ~ 30x30
        assert np.all(cids == 1)


def test_via_quad_mask_geometry(via_dir):
    ds = ViaDataset()
    ds.load_via(via_dir, "train")
    ds.prepare()
    masks, _ = ds.load_mask(0)
    quad = masks[:, :, 1]
    # interior filled, exterior empty
    assert quad[35, 60] and not quad[35, 30] and not quad[10, 60]


def test_color_splash(via_dir, rng):
    ds = ViaDataset()
    ds.load_via(via_dir, "train")
    ds.prepare()
    img = ds.load_image(0)
    masks, _ = ds.load_mask(0)
    out = color_splash(img, masks)
    assert out.shape == img.shape
    # masked pixels keep color, unmasked become gray (R==G==B)
    inside = np.argwhere(masks.any(-1))[0]
    outside = np.argwhere(~masks.any(-1))[0]
    assert np.array_equal(out[inside[0], inside[1]], img[inside[0], inside[1]])
    o = out[outside[0], outside[1]]
    assert o[0] == o[1] == o[2]


def test_kmeans_perfect_clusters():
    wh = np.array([[0.1, 0.1]] * 10 + [[0.5, 0.5]] * 10)
    centroids, avg = kmeans_anchors(wh, 2, seed=0)
    np.testing.assert_allclose(sorted(centroids[:, 0]), [0.1, 0.5], atol=1e-9)
    assert avg > 0.999


def test_gen_anchors_grid_units():
    wh = np.array([[0.2, 0.2]] * 8)
    anchors, _ = gen_anchors(wh, 1, grid=7)
    np.testing.assert_allclose(anchors[0], [1.4, 1.4], atol=1e-9)


def test_sweep_monotonic():
    rng = np.random.RandomState(0)
    wh = rng.uniform(0.05, 0.5, size=(60, 2))
    ks, ious = sweep_k(wh, 6)
    assert ks == [1, 2, 3, 4, 5, 6]
    # avg IoU must improve (weakly) with more anchors
    assert all(b >= a - 1e-6 for a, b in zip(ious, ious[1:]))


def test_boxes_to_wh_filters_degenerate():
    boxes = np.array([[0, 0, 20, 30], [5, 5, 5, 9]])
    wh = boxes_to_wh(boxes, (100, 100))
    assert wh.shape == (1, 2)
    np.testing.assert_allclose(wh[0], [0.2, 0.3])


def test_wh_iou_matrix():
    wh = np.array([[0.2, 0.2]])
    cents = np.array([[0.2, 0.2], [0.1, 0.2]])
    iou = wh_iou_matrix(wh, cents)[0]
    np.testing.assert_allclose(iou, [1.0, 0.5], atol=1e-9)
