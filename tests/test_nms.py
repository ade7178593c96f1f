"""NMS golden tests: device NMS (ops/nms.py) vs numpy ports of the
reference's host-side suppression (myolo_utils.py:36-113)."""

import jax.numpy as jnp
import numpy as np

from mask_yolo_tpu.ops.nms import (class_aware_nms, greedy_nms_mask,
                                   index_order_class_nms_mask,
                                   per_class_topk_nms, reference_softmax,
                                   top_k_detections)
from mask_yolo_tpu.utils.host_ops import NMB, _softmax, bbox_iou_xyxy


def random_boxes_scores(rng, n):
    lo = rng.uniform(0, 0.7, size=(n, 2))
    hi = lo + rng.uniform(0.1, 0.3, size=(n, 2))
    boxes = np.concatenate([lo, hi], axis=1).astype(np.float32)
    scores = rng.rand(n).astype(np.float32)
    return boxes, scores


def numpy_greedy_nms(boxes, scores, thr):
    order = np.argsort(-scores, kind="stable")
    keep = np.ones(len(boxes), dtype=bool)
    for ii, i in enumerate(order):
        if not keep[i] or scores[i] <= 0:
            continue
        for j in order[ii + 1 :]:
            if keep[j] and bbox_iou_xyxy(boxes[i], boxes[j]) >= thr:
                keep[j] = False
    return keep


def test_greedy_nms_matches_numpy(rng):
    for _ in range(10):
        boxes, scores = random_boxes_scores(rng, 24)
        got = np.asarray(greedy_nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.4))
        exp = numpy_greedy_nms(boxes, scores, 0.4)
        assert np.array_equal(got, exp)


def test_greedy_nms_blocked_large_n_matches_numpy(rng):
    """N > 512 takes the blocked-tile path (TILE=128 with inter-tile mask
    carry) — must agree with the sequential numpy greedy at N=845 (the
    13·13·5 CocoStyleConfig box count), including the non-multiple-of-128
    padding tail."""
    for n in (600, 845):
        boxes, scores = random_boxes_scores(rng, n)
        scores[rng.choice(n, 50, replace=False)] = 0.0  # inactive slots
        got = np.asarray(greedy_nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.4))
        exp = numpy_greedy_nms(boxes, scores, 0.4)
        assert np.array_equal(got, exp)


def test_class_aware_nms_large_n(rng):
    """class_aware_nms at 845 boxes (the infer_yolo 416² shape) stays exact
    through the blocked path, vmapped over classes."""
    boxes, _ = random_boxes_scores(rng, 845)
    class_scores = rng.rand(845, 3).astype(np.float32)
    class_scores[class_scores < 0.5] = 0.0
    out = np.asarray(class_aware_nms(jnp.asarray(boxes),
                                     jnp.asarray(class_scores), 0.4))
    for c in range(3):
        keep = numpy_greedy_nms(boxes, class_scores[:, c], 0.4)
        np.testing.assert_allclose(out[:, c], class_scores[:, c] * keep)


def test_per_class_topk_nms_exact_when_under_k(rng):
    """per_class_topk_nms == class_aware_nms whenever every class has <= k
    positive-score boxes (the documented exactness condition), on a dense
    845-box fixture shaped like the 416² infer_yolo grid."""
    boxes, _ = random_boxes_scores(rng, 845)
    # exactly 25 positive boxes per class (<= k=32 by construction; the rng
    # fixture is session-scoped so chance-based sparsity is order-dependent)
    class_scores = np.zeros((845, 5), dtype=np.float32)
    for c in range(5):
        pos = rng.choice(845, 25, replace=False)
        class_scores[pos, c] = rng.rand(25).astype(np.float32) * 0.9 + 0.1
    exact = np.asarray(class_aware_nms(jnp.asarray(boxes),
                                       jnp.asarray(class_scores), 0.4))
    fast = np.asarray(per_class_topk_nms(jnp.asarray(boxes),
                                         jnp.asarray(class_scores), 32, 0.4))
    np.testing.assert_allclose(fast, exact, atol=1e-7)


def test_per_class_topk_nms_k_ge_n_falls_back(rng):
    boxes, _ = random_boxes_scores(rng, 16)
    class_scores = rng.rand(16, 3).astype(np.float32)
    exact = np.asarray(class_aware_nms(jnp.asarray(boxes),
                                       jnp.asarray(class_scores), 0.4))
    fast = np.asarray(per_class_topk_nms(jnp.asarray(boxes),
                                         jnp.asarray(class_scores), 64, 0.4))
    np.testing.assert_allclose(fast, exact, atol=1e-7)


def test_per_class_topk_nms_over_k_drops_lowest(rng):
    """When a class has MORE than k positive boxes, the compaction drops the
    lowest-scored ones before suppression — kept boxes are always a subset of
    the class's top-k, and every kept score matches the input."""
    boxes, _ = random_boxes_scores(rng, 64)
    class_scores = rng.rand(64, 2).astype(np.float32)  # all 64 positive
    k = 8
    out = np.asarray(per_class_topk_nms(jnp.asarray(boxes),
                                        jnp.asarray(class_scores), k, 0.4))
    for c in range(2):
        kept = np.where(out[:, c] > 0)[0]
        topk = np.argsort(-class_scores[:, c], kind="stable")[:k]
        assert set(kept) <= set(topk.tolist())
        np.testing.assert_allclose(out[kept, c], class_scores[kept, c])


def test_greedy_nms_zero_scores_never_suppress(rng):
    boxes = np.array([[0, 0, 1, 1], [0, 0, 1, 1]], dtype=np.float32)
    scores = np.array([0.0, 0.9], dtype=np.float32)
    got = np.asarray(greedy_nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5))
    assert got[1]  # high-score box survives even though a zero-score twin exists


def test_class_aware_nms_zeroes_suppressed(rng):
    boxes, _ = random_boxes_scores(rng, 16)
    class_scores = rng.rand(16, 3).astype(np.float32)
    out = np.asarray(class_aware_nms(jnp.asarray(boxes), jnp.asarray(class_scores), 0.4))
    for c in range(3):
        keep = numpy_greedy_nms(boxes, class_scores[:, c], 0.4)
        np.testing.assert_allclose(out[:, c], class_scores[:, c] * keep, atol=1e-7)


def test_index_order_nms_matches_nmb(rng):
    for _ in range(10):
        boxes, _ = random_boxes_scores(rng, 12)
        class_ids = rng.randint(0, 3, size=12)
        indices = np.arange(12)
        exp_idx = NMB(boxes, class_ids, indices, [64, 64, 3], nms_threshold=0.4)
        got = np.asarray(index_order_class_nms_mask(
            jnp.asarray(boxes), jnp.asarray(class_ids),
            jnp.ones(12, dtype=bool), 0.4))
        assert set(np.where(got)[0]) == set(exp_idx.tolist())


def test_reference_softmax_matches_numpy(rng):
    x = rng.randn(4, 4, 2, 5).astype(np.float32) * 10
    got = np.asarray(reference_softmax(jnp.asarray(x)))
    exp = _softmax(x)
    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-6)


def test_reference_softmax_extreme_rescale():
    x = np.array([[0.0, -500.0, 1.0]], dtype=np.float32)
    got = np.asarray(reference_softmax(jnp.asarray(x)))
    exp = _softmax(x)
    np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-6)


def test_top_k_detections(rng):
    boxes, scores = random_boxes_scores(rng, 20)
    classes = rng.randint(0, 3, size=20).astype(np.int32)
    b, s, c, v = top_k_detections(jnp.asarray(boxes), jnp.asarray(scores),
                                  jnp.asarray(classes), 5, 0.5)
    order = np.argsort(-scores)[:5]
    np.testing.assert_allclose(np.asarray(s), scores[order], atol=1e-7)
    assert np.array_equal(np.asarray(v), scores[order] > 0.5)


def test_detection_nms_threshold_config(tiny_config):
    """DETECTION_NMS_THRESHOLD controls the second-stage suppression: two
    heavily-overlapping same-class boxes both survive at the loose reference
    default (0.7) and collapse to one at 0.3."""
    import jax.numpy as jnp

    from mask_yolo_tpu.ops.nms import index_order_class_nms_mask

    boxes = jnp.asarray([[0.1, 0.1, 0.5, 0.5], [0.18, 0.18, 0.58, 0.58]],
                        dtype=jnp.float32)
    classes = jnp.asarray([1, 1], dtype=jnp.int32)
    valid = jnp.asarray([True, True])
    keep_loose = np.asarray(index_order_class_nms_mask(boxes, classes, valid, 0.7))
    keep_tight = np.asarray(index_order_class_nms_mask(boxes, classes, valid, 0.3))
    assert keep_loose.tolist() == [True, True]
    assert keep_tight.tolist() == [True, False]
