"""Target-assignment golden tests vs a numpy port of
detect_mask_target_graph semantics (reference model.py:457-602)."""

import jax.numpy as jnp
import numpy as np

from mask_yolo_tpu.ops.target_assign import (assign_mask_targets,
                                             assign_mask_targets_single)
from mask_yolo_tpu.utils.host_ops import crop_and_resize_np


def iou_matrix_np(a, b):
    x1 = np.maximum(a[:, None, 0], b[None, :, 0])
    y1 = np.maximum(a[:, None, 1], b[None, :, 1])
    x2 = np.minimum(a[:, None, 2], b[None, :, 2])
    y2 = np.minimum(a[:, None, 3], b[None, :, 3])
    inter = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
    aa = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    bb = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / (aa[:, None] + bb[None, :] - inter)


def numpy_assign(proposals, gt_ids, gt_boxes, gt_masks, mask_shape):
    """Port of the reference semantics, in original proposal order."""
    valid = np.abs(gt_boxes).sum(1) > 0
    vb = gt_boxes[valid]
    vids = gt_ids[valid]
    vmasks = gt_masks[:, :, valid]
    r = proposals.shape[0]
    tc = np.zeros(r, dtype=np.int32)
    tm = np.zeros((r,) + tuple(mask_shape), dtype=np.float32)
    if vb.shape[0] == 0:
        return tc, tm
    ov = iou_matrix_np(proposals, vb)
    roi_max = ov.max(1)
    best = ov.argmax(1)
    for i in range(r):
        if roi_max[i] >= 0.5:
            tc[i] = vids[best[i]]
            x1, y1, x2, y2 = proposals[i]
            crop = crop_and_resize_np(vmasks[:, :, best[i]].astype(np.float64),
                                      [(y1, x1, y2, x2)], mask_shape)[0]
            tm[i] = np.round(crop)
    return tc, tm


def random_case(rng, r=8, g=4, hw=32):
    lo = rng.uniform(0, 0.6, size=(r, 2))
    hi = lo + rng.uniform(0.1, 0.4, size=(r, 2))
    proposals = np.concatenate([lo, hi], 1).astype(np.float32)
    gt_boxes = np.zeros((g, 4), dtype=np.float32)
    gt_ids = np.zeros(g, dtype=np.int32)
    n = rng.randint(1, g)
    # make some GTs coincide with proposals so positives exist
    for i in range(n):
        if i < r and rng.rand() < 0.7:
            jitter = rng.uniform(-0.02, 0.02, 4)
            gt_boxes[i] = np.clip(proposals[i] + jitter, 0, 1)
        else:
            lo2 = rng.uniform(0, 0.6, 2)
            gt_boxes[i] = np.concatenate([lo2, lo2 + rng.uniform(0.1, 0.4, 2)])
        gt_ids[i] = rng.randint(1, 3)
    gt_masks = (rng.rand(hw, hw, g) > 0.5).astype(np.float32)
    return proposals, gt_ids, gt_boxes, gt_masks


def test_assignment_matches_numpy(rng):
    for _ in range(8):
        p, ids, bx, mk = random_case(rng)
        rois, tc, tm = assign_mask_targets_single(
            jnp.asarray(p), jnp.asarray(ids), jnp.asarray(bx), jnp.asarray(mk),
            (8, 8))
        exp_tc, exp_tm = numpy_assign(p, ids, bx, mk, (8, 8))
        np.testing.assert_array_equal(np.asarray(tc), exp_tc)
        # rounding at exactly 0.5 can differ by float precision; allow tiny diffs
        diff = np.abs(np.asarray(tm) - exp_tm).mean()
        assert diff < 0.02, diff
        np.testing.assert_allclose(np.asarray(rois), p, atol=1e-7)


def test_no_valid_gt_gives_all_negative(rng):
    p, ids, bx, mk = random_case(rng)
    bx[:] = 0
    _, tc, tm = assign_mask_targets_single(
        jnp.asarray(p), jnp.asarray(ids), jnp.asarray(bx), jnp.asarray(mk), (8, 8))
    assert np.all(np.asarray(tc) == 0)
    assert np.all(np.asarray(tm) == 0)


def test_batched_assignment(rng):
    cases = [random_case(rng) for _ in range(3)]
    p = jnp.asarray(np.stack([c[0] for c in cases]))
    ids = jnp.asarray(np.stack([c[1] for c in cases]))
    bx = jnp.asarray(np.stack([c[2] for c in cases]))
    mk = jnp.asarray(np.stack([c[3] for c in cases]))
    rois, tc, tm = assign_mask_targets(p, ids, bx, mk, (8, 8))
    assert rois.shape == (3, 8, 4)
    assert tc.shape == (3, 8)
    assert tm.shape == (3, 8, 8, 8)
    for i, c in enumerate(cases):
        exp_tc, _ = numpy_assign(*c, (8, 8))
        np.testing.assert_array_equal(np.asarray(tc[i]), exp_tc)


def test_mini_mask_assignment_matches_fullsize(rng):
    """A GT whose mini-mask is exact (solid rectangle) must produce the same
    target masks through the mini-mask path as through the full-size path."""
    hw, r = 32, 6
    # one solid rectangular GT instance
    gt_boxes = np.array([[0.25, 0.25, 0.75, 0.75]], dtype=np.float32)
    gt_ids = np.array([2], dtype=np.int32)
    full = np.zeros((hw, hw, 1), np.float32)
    full[8:24, 8:24, 0] = 1.0
    # mini-mask of a solid rectangle is all-ones
    mini = np.ones((16, 16, 1), np.float32)

    proposals = np.array([
        [0.25, 0.25, 0.75, 0.75],   # exact hit
        [0.30, 0.30, 0.80, 0.80],   # overlapping positive
        [0.0, 0.0, 0.10, 0.10],     # negative
        [0.25, 0.25, 0.50, 0.75],   # half of the GT
        [0.20, 0.20, 0.70, 0.70],
        [0.40, 0.25, 0.75, 0.60],
    ], dtype=np.float32)

    _, tc_f, tm_f = assign_mask_targets_single(
        jnp.asarray(proposals), jnp.asarray(gt_ids), jnp.asarray(gt_boxes),
        jnp.asarray(full), (8, 8), False)
    _, tc_m, tm_m = assign_mask_targets_single(
        jnp.asarray(proposals), jnp.asarray(gt_ids), jnp.asarray(gt_boxes),
        jnp.asarray(mini), (8, 8), True)

    np.testing.assert_array_equal(np.asarray(tc_f), np.asarray(tc_m))
    # interior of positives agrees (borders may differ by one bilinear sample)
    agree = (np.asarray(tm_f) == np.asarray(tm_m)).mean()
    assert agree > 0.9, agree


def test_mini_mask_roi_outside_gt_box_crops_zero(rng):
    """Samples falling outside the GT box (mini-mask frame) must read 0,
    matching crop_and_resize extrapolation_value=0."""
    gt_boxes = np.array([[0.4, 0.4, 0.6, 0.6]], dtype=np.float32)
    gt_ids = np.array([1], dtype=np.int32)
    mini = np.ones((8, 8, 1), np.float32)
    # positive proposal much bigger than the GT box: IoU = 0.04/0.16 < 0.5 →
    # use a proposal just big enough to stay positive but extend past the box
    proposals = np.array([[0.38, 0.38, 0.62, 0.62]], dtype=np.float32)
    _, tc, tm = assign_mask_targets_single(
        jnp.asarray(proposals), jnp.asarray(gt_ids), jnp.asarray(gt_boxes),
        jnp.asarray(mini), (12, 12), True)
    tm = np.asarray(tm)[0]
    assert np.asarray(tc)[0] == 1
    # corners of the crop are outside the GT box → zero
    assert tm[0, 0] == 0 and tm[-1, -1] == 0
    # center is inside → one
    assert tm[6, 6] == 1
