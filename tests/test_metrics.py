"""Tests for the evaluation-metrics module (the mrcnn.utils surface the
reference depends on externally — SURVEY.md §1) and the mini-mask utilities
(reference myolo_utils.py:413-430; model.py:562-578 TODO, fixed here)."""

import numpy as np
import pytest

from mask_yolo_tpu.utils import metrics
from mask_yolo_tpu.data.loader import (expand_mask, extract_bboxes,
                                       minimize_mask, mold_image,
                                       unmold_image)


def test_compute_overlaps_identity_and_disjoint():
    boxes = np.array([[0, 0, 10, 10], [20, 20, 30, 30]], dtype=np.float64)
    ov = metrics.compute_overlaps(boxes, boxes)
    assert np.allclose(np.diag(ov), 1.0)
    assert ov[0, 1] == 0.0


def test_compute_overlaps_half():
    a = np.array([[0, 0, 10, 10]], dtype=np.float64)
    b = np.array([[0, 0, 10, 5]], dtype=np.float64)
    assert np.isclose(metrics.compute_overlaps(a, b)[0, 0], 0.5)


def test_compute_matches_greedy_by_score():
    gt_boxes = np.array([[0, 0, 10, 10]], dtype=np.float64)
    gt_ids = np.array([1])
    # two preds on the same GT: higher score wins the match
    pred_boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11]], dtype=np.float64)
    pred_ids = np.array([1, 1])
    pred_scores = np.array([0.4, 0.9])
    gt_match, pred_match, _ = metrics.compute_matches(
        gt_boxes, gt_ids, None, pred_boxes, pred_ids, pred_scores)
    # score order: pred index 0 after sort is the 0.9 one (original idx 1)
    assert pred_match[0] == 0 and pred_match[1] == -1
    assert gt_match[0] == 0


def test_compute_matches_class_must_agree():
    gt_boxes = np.array([[0, 0, 10, 10]], dtype=np.float64)
    gt_match, pred_match, _ = metrics.compute_matches(
        gt_boxes, np.array([1]), None,
        gt_boxes.copy(), np.array([2]), np.array([0.9]))
    assert gt_match[0] == -1 and pred_match[0] == -1


def test_compute_ap_perfect_and_empty():
    gt_boxes = np.array([[0, 0, 10, 10], [20, 20, 30, 30]], dtype=np.float64)
    gt_ids = np.array([1, 2])
    ap, prec, rec, _ = metrics.compute_ap(
        gt_boxes, gt_ids, None, gt_boxes.copy(), gt_ids.copy(),
        np.array([0.9, 0.8]))
    assert np.isclose(ap, 1.0)
    ap0, _, _, _ = metrics.compute_ap(
        gt_boxes, gt_ids, None, np.zeros((0, 4)), np.zeros(0), np.zeros(0))
    assert ap0 == 0.0


def test_compute_ap_half():
    gt_boxes = np.array([[0, 0, 10, 10], [20, 20, 30, 30]], dtype=np.float64)
    gt_ids = np.array([1, 1])
    # one correct pred, one false positive far away
    pred_boxes = np.array([[0, 0, 10, 10], [50, 50, 60, 60]], dtype=np.float64)
    ap, _, _, _ = metrics.compute_ap(
        gt_boxes, gt_ids, None, pred_boxes, np.array([1, 1]),
        np.array([0.9, 0.8]))
    assert np.isclose(ap, 0.5)


def test_compute_ap_range_monotone():
    gt_boxes = np.array([[0, 0, 10, 10]], dtype=np.float64)
    # slightly-off box: matches at IoU 0.5 but not at 0.95
    pred_boxes = np.array([[1, 1, 11, 11]], dtype=np.float64)
    m = metrics.compute_ap_range(gt_boxes, np.array([1]), None,
                                 pred_boxes, np.array([1]), np.array([0.9]))
    assert 0.0 < m < 1.0


def test_compute_recall():
    gt = np.array([[0, 0, 10, 10], [20, 20, 30, 30]], dtype=np.float64)
    pred = np.array([[0, 0, 10, 10]], dtype=np.float64)
    recall, pos = metrics.compute_recall(pred, gt, iou=0.5)
    assert np.isclose(recall, 0.5)
    assert list(pos) == [0]


def test_mask_overlaps_match_box_overlaps_for_solid_boxes():
    h = w = 32
    boxes = np.array([[2, 4, 12, 14], [8, 8, 20, 20]], dtype=np.float64)
    masks = np.zeros((h, w, 2), bool)
    for i, (x1, y1, x2, y2) in enumerate(boxes.astype(int)):
        masks[y1:y2, x1:x2, i] = True
    ov_box = metrics.compute_overlaps(boxes, boxes)
    ov_mask = metrics.compute_overlaps_masks(masks, masks)
    assert np.allclose(ov_box, ov_mask, atol=1e-6)


# ---------------------------------------------------------------------------
# mini-mask + mold_image
# ---------------------------------------------------------------------------


def _rect_mask(h, w, x1, y1, x2, y2):
    m = np.zeros((h, w, 1), bool)
    m[y1:y2, x1:x2, 0] = True
    return m


def test_minimize_expand_roundtrip_rect():
    mask = _rect_mask(64, 64, 10, 20, 40, 50)
    bbox = extract_bboxes(mask)
    assert list(bbox[0]) == [10, 20, 40, 50]
    mini = minimize_mask(bbox, mask, (28, 28))
    assert mini.shape == (28, 28, 1)
    assert mini[:, :, 0].mean() > 0.9  # a full rectangle fills its mini-mask
    back = expand_mask(bbox, mini, (64, 64))
    iou = (back & mask).sum() / (back | mask).sum()
    assert iou > 0.9


def test_minimize_mask_zero_area_raises():
    mask = np.zeros((16, 16, 1), bool)
    bbox = np.zeros((1, 4), np.int32)
    with pytest.raises(ValueError):
        minimize_mask(bbox, mask, (8, 8))


def test_mold_unmold_image_roundtrip(tiny_config):
    img = (np.random.default_rng(0).integers(0, 255, (8, 8, 3))
           .astype(np.uint8))
    molded = mold_image(img, tiny_config)
    assert molded.dtype == np.float32
    assert np.allclose(molded + tiny_config.MEAN_PIXEL, img, atol=1e-4)
    assert np.array_equal(unmold_image(molded, tiny_config), img)


def test_mask_overlaps_zero_instances():
    m0 = np.zeros((8, 8, 0), bool)
    m2 = np.ones((8, 8, 2), bool)
    assert metrics.compute_overlaps_masks(m0, m2).shape == (0, 2)
    assert metrics.compute_overlaps_masks(m2, m0).shape == (2, 0)
    # compute_ap with masks and zero predictions
    ap, _, _, _ = metrics.compute_ap(
        np.array([[0, 0, 4, 4]]), np.array([1]), m2[:, :, :1],
        np.zeros((0, 4)), np.zeros(0), np.zeros(0), m0)
    assert ap == 0.0


class TestAPAccumulator:
    """Pooled (dataset-level) AP — the true VOC/COCO definition."""

    def test_perfect_predictions(self):
        acc = metrics.APAccumulator()
        for _ in range(3):
            gt = np.array([[0, 0, 10, 10], [20, 20, 30, 30]], float)
            ids = np.array([1, 2])
            acc.add(gt, ids, None, gt, ids, np.array([0.9, 0.8]))
        assert acc.ap(0.5) == 1.0
        assert acc.map_range() == 1.0

    def test_pooled_differs_from_per_image_mean(self):
        # image A: 1 GT, 1 perfect pred at score 0.9  -> per-image AP 1.0
        # image B: 1 GT, 1 false positive at score 0.95 -> per-image AP 0.0
        # mean per-image AP = 0.5; pooled: global order is [FP(0.95), TP(0.9)]
        # -> precisions [0, 0.5] at recalls [0, 0.5]; recall never reaches 1.0
        # (2 GT, 1 TP) -> AP = 0.5 * 0.5 = 0.25.
        acc = metrics.APAccumulator()
        gt = np.array([[0, 0, 10, 10]], float)
        acc.add(gt, [1], None, gt, [1], [0.9])
        acc.add(gt, [1], None, np.array([[50, 50, 60, 60.0]]), [1], [0.95])
        assert abs(acc.ap(0.5) - 0.25) < 1e-9

    def test_empty_images_do_not_penalize(self):
        acc = metrics.APAccumulator()
        gt = np.array([[0, 0, 10, 10]], float)
        acc.add(gt, [1], None, gt, [1], [0.9])
        # a correct empty image: no GT, no predictions
        acc.add(np.zeros((0, 4)), np.zeros(0, int), None,
                np.zeros((0, 4)), np.zeros(0, int), np.zeros(0))
        assert acc.ap(0.5) == 1.0

    def test_macro_over_classes_present_in_gt(self):
        # class 1: perfect; class 2: GT but no predictions (AP 0);
        # class 3: prediction but no GT (ignored) -> mAP = 0.5
        acc = metrics.APAccumulator()
        b = np.array([[0, 0, 10, 10]], float)
        b2 = np.array([[20, 20, 30, 30]], float)
        acc.add(np.vstack([b, b2]), [1, 2], None, b, [1], [0.9])
        acc.add(np.zeros((0, 4)), np.zeros(0, int), None, b, [3], [0.8])
        assert abs(acc.ap(0.5) - 0.5) < 1e-9

    def test_mask_ap(self):
        acc = metrics.APAccumulator()
        m = np.zeros((16, 16, 1), bool)
        m[2:8, 2:8, 0] = True
        gt = np.array([[2, 2, 8, 8]], float)
        acc.add(gt, [1], m, gt, [1], [0.9], m)
        assert acc.ap(0.5, use_masks=True) == 1.0

    def test_matching_stays_per_image(self):
        # the only GT lives in image A; a perfect-IoU box in image B must NOT
        # match it (pooling is global, matching is per-image)
        acc = metrics.APAccumulator()
        gt = np.array([[0, 0, 10, 10]], float)
        acc.add(gt, [1], None, np.zeros((0, 4)), np.zeros(0, int), np.zeros(0))
        acc.add(np.zeros((0, 4)), np.zeros(0, int), None, gt, [1], [0.99])
        assert acc.ap(0.5) == 0.0
