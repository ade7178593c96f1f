"""ROIAlign golden tests: the separable-matmul crop (ops/roi_align.py) must
match a direct numpy port of tf.image.crop_and_resize bilinear semantics
(the op the reference's PyramidROIAlign wraps, model.py:385-387)."""

import jax.numpy as jnp
import numpy as np

from mask_yolo_tpu.ops.roi_align import (crop_and_resize,
                                         crop_and_resize_per_roi,
                                         interp_matrix, paste_masks)
from mask_yolo_tpu.utils.host_ops import crop_and_resize_np


def random_boxes(rng, n, allow_degenerate=False):
    """Random normalized (x1, y1, x2, y2) boxes."""
    lo = rng.uniform(-0.2, 0.8, size=(n, 2))
    hi = lo + rng.uniform(0.05 if not allow_degenerate else -0.1, 0.5, size=(n, 2))
    return np.concatenate([lo, hi], axis=1).astype(np.float32)


def test_crop_matches_tf_semantics(rng):
    img = rng.rand(1, 12, 16, 3).astype(np.float32)
    boxes = random_boxes(rng, 7)[None]  # [1, 7, 4]
    got = np.asarray(crop_and_resize(jnp.asarray(img), jnp.asarray(boxes), (5, 4)))
    # golden: TF takes (y1, x1, y2, x2)
    tf_boxes = boxes[0][:, [1, 0, 3, 2]]
    exp = crop_and_resize_np(img[0], tf_boxes, (5, 4))
    np.testing.assert_allclose(got[0], exp, atol=1e-5)


def test_crop_out_of_range_extrapolates_zero(rng):
    img = np.ones((1, 8, 8, 1), dtype=np.float32)
    boxes = np.array([[[-0.5, -0.5, 0.5, 0.5]]], dtype=np.float32)  # top-left off image
    got = np.asarray(crop_and_resize(jnp.asarray(img), jnp.asarray(boxes), (4, 4)))
    tf_boxes = boxes[0][:, [1, 0, 3, 2]]
    exp = crop_and_resize_np(img[0], tf_boxes, (4, 4))
    np.testing.assert_allclose(got[0], exp, atol=1e-6)
    assert got[0, 0, 0, 0, 0] == 0.0  # corner sample is outside → extrapolated 0


def test_crop_pool_size_one(rng):
    img = rng.rand(1, 9, 9, 2).astype(np.float32)
    boxes = random_boxes(rng, 3)[None]
    got = np.asarray(crop_and_resize(jnp.asarray(img), jnp.asarray(boxes), (1, 1)))
    exp = crop_and_resize_np(img[0], boxes[0][:, [1, 0, 3, 2]], (1, 1))
    np.testing.assert_allclose(got[0], exp, atol=1e-5)


def test_per_roi_crop_matches(rng):
    imgs = rng.rand(5, 10, 10).astype(np.float32)
    boxes = random_boxes(rng, 5)
    got = np.asarray(
        crop_and_resize_per_roi(jnp.asarray(imgs), jnp.asarray(boxes), (6, 6)))
    for r in range(5):
        exp = crop_and_resize_np(imgs[r], boxes[r : r + 1][:, [1, 0, 3, 2]], (6, 6))[0]
        np.testing.assert_allclose(got[r], exp, atol=1e-5)


def test_interp_matrix_rows_sum_to_one_inside():
    w = np.asarray(interp_matrix(jnp.asarray([0.1]), jnp.asarray([0.9]), 16, 8))
    sums = w[0].sum(axis=-1)
    np.testing.assert_allclose(sums, np.ones(8), atol=1e-6)


def test_paste_masks_roundtrip(rng):
    """A mask pasted into its own box should cover ≈ the box area and nothing
    outside it."""
    masks = np.ones((1, 8, 8), dtype=np.float32)
    boxes = np.array([[0.25, 0.25, 0.75, 0.75]], dtype=np.float32)
    full = np.asarray(paste_masks(jnp.asarray(masks), jnp.asarray(boxes), (64, 64)))
    binary = full[0] >= 0.5
    ys, xs = np.where(binary)
    assert 14 <= ys.min() <= 17 and 46 <= ys.max() <= 49
    assert 14 <= xs.min() <= 17 and 46 <= xs.max() <= 49
    # nothing outside a slightly dilated box
    assert not binary[:12, :].any() and not binary[52:, :].any()


def test_paste_masks_against_host_unmold(rng):
    """Device paste vs the host unmold_mask golden (same box, same mask).
    The host version resizes with half-pixel centers while the device paste
    uses align-corners sampling, so compare with an IoU criterion."""
    from mask_yolo_tpu.utils.host_ops import unmold_mask

    # smooth mask (a soft disk): boundary-pixel resampling differences between
    # the device's align-corners paste and the host's half-pixel resize stay
    # local, so the pasted results must agree to high IoU
    yy, xx = np.mgrid[:28, :28]
    mask = (np.hypot(yy - 13.5, xx - 13.5) < 10).astype(np.float32)[None]
    box = np.array([0.2, 0.3, 0.7, 0.8], dtype=np.float32)
    full_dev = np.asarray(
        paste_masks(jnp.asarray(mask), jnp.asarray(box[None]), (96, 96)))[0] >= 0.5
    full_host = unmold_mask(mask[0], box, [96, 96, 3])
    inter = (full_dev & full_host).sum()
    union = (full_dev | full_host).sum()
    assert inter / max(union, 1) > 0.9, inter / max(union, 1)


def test_multilevel_crop_level_assignment(rng):
    """FPN eq.1: small ROIs read the fine level, large ROIs the coarse one;
    each crop matches a single-level crop_and_resize of its assigned map."""
    from mask_yolo_tpu.ops.roi_align import multilevel_crop_and_resize

    b, c = 2, 8
    # two-level pyramid: fine 32², coarse 16² — distinct constant contents
    fine = jnp.asarray(np.full((b, 32, 32, c), 1.0, np.float32))
    coarse = jnp.asarray(np.full((b, 16, 16, c), 2.0, np.float32))
    boxes = jnp.asarray(np.asarray([
        # 56-px ROI (0.125×448) → level 2 + round(log2(56/224)) = 0
        [[0.1, 0.1, 0.225, 0.225],
         # 448-px ROI → level 2 + 1 = 3 → clipped to 1 (coarse)
         [0.0, 0.0, 1.0, 1.0]]] * b, dtype=np.float32).reshape(b, 2, 4))
    out = multilevel_crop_and_resize((fine, coarse), boxes, (4, 4),
                                     image_hw=(448, 448))
    out = np.asarray(out)
    assert np.allclose(out[:, 0], 1.0)   # small ROI ← fine level
    assert np.allclose(out[:, 1], 2.0)   # large ROI ← coarse level


def test_multilevel_single_level_equals_plain(rng):
    """With one level, multilevel == plain crop_and_resize exactly."""
    from mask_yolo_tpu.ops.roi_align import (crop_and_resize,
                                             multilevel_crop_and_resize)

    f = jnp.asarray(rng.rand(1, 16, 16, 4).astype(np.float32))
    boxes = jnp.asarray(rng.rand(1, 5, 2).astype(np.float32))
    boxes = jnp.concatenate([boxes * 0.4, boxes * 0.4 + 0.5], axis=-1)
    a = multilevel_crop_and_resize((f,), boxes, (6, 6))
    c = crop_and_resize(f, boxes, (6, 6))
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-6)
