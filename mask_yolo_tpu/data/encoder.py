"""YOLO grid-target encoding, vectorized.

Replaces the per-instance Python loops of the reference BatchGenerator
(/root/reference/myolo/myolo_utils.py:769-820): each GT box is mapped to the
grid cell containing its center and the anchor prior with the best wh-IoU,
then (cx, cy, w, h) in grid units, conf=1 and a one-hot class are written at
[gy, gx, anchor]. Here the whole assignment is a vectorized scatter (numpy on
host, jnp inside jit) — no data-dependent Python control flow.

Semantics notes (verified against the reference):
 * If several GT boxes land on the same (cell, anchor), the *last* one wins
   (the reference overwrites in loop order). The scatter preserves this by
   writing instances in order.
 * true_boxes holds up to TRUE_BOX_BUFFER boxes in grid units; the reference
   wraps the write index modulo the buffer, which matters only if an image
   has more GT than the buffer — excess GT is subsampled upstream, so a plain
   truncation is equivalent.
 * Boxes whose center cell falls outside the grid are dropped (the reference
   checks grid_x < GRID_W and grid_y < GRID_H).
"""

from __future__ import annotations

import numpy as np


def wh_iou(wh: np.ndarray, anchors: np.ndarray) -> np.ndarray:
    """IoU between origin-anchored (w, h) boxes [N, 2] and anchors [A, 2].

    Equivalent to the reference's bbox_iou(BoundBox(0,0,w,h), anchor)
    (myolo_utils.py:187-198 with both boxes at the origin).
    """
    inter = np.minimum(wh[:, None, 0], anchors[None, :, 0]) * np.minimum(
        wh[:, None, 1], anchors[None, :, 1]
    )
    union = wh[:, 0:1] * wh[:, 1:2] + (anchors[:, 0] * anchors[:, 1])[None, :] - inter
    return inter / np.maximum(union, 1e-10)


def encode_yolo_targets(gt_boxes: np.ndarray, gt_class_ids: np.ndarray, config):
    """Encode one image's GT into YOLO grid targets.

    gt_boxes: [G, 4] float (x1, y1, x2, y2) pixel coords, zero-padded.
    gt_class_ids: [G] int, zero-padded (0 = background = padding).

    Returns:
      yolo_target: [GRID_H, GRID_W, N_BOX, 5 + NUM_CLASSES] float32
      true_boxes:  [1, 1, 1, TRUE_BOX_BUFFER, 4] float32 (cx, cy, w, h) grid units
    """
    gh, gw, nb = config.GRID_H, config.GRID_W, config.N_BOX
    nc = config.NUM_CLASSES
    img_w = float(config.IMAGE_SHAPE[0])
    img_h = float(config.IMAGE_SHAPE[1])
    anchors = config.anchors_wh  # [A, 2] grid units

    target = np.zeros((gh, gw, nb, 5 + nc), dtype=np.float32)
    true_boxes = np.zeros((1, 1, 1, config.TRUE_BOX_BUFFER, 4), dtype=np.float32)

    gt_boxes = np.asarray(gt_boxes, dtype=np.float32)
    gt_class_ids = np.asarray(gt_class_ids)
    valid = np.abs(gt_boxes).sum(axis=1) > 0
    if not valid.any():
        return target, true_boxes

    boxes = gt_boxes[valid]
    classes = gt_class_ids[valid]
    if classes.size and int(classes.max()) >= nc:
        raise ValueError(
            f"GT class id {int(classes.max())} out of range for "
            f"NUM_CLASSES={nc} (ids must be < NUM_CLASSES)")

    # centers and sizes in grid units (reference divides by IMAGE/GRID per axis:
    # myolo_utils.py:778-790)
    cx = 0.5 * (boxes[:, 0] + boxes[:, 2]) / (img_w / gw)
    cy = 0.5 * (boxes[:, 1] + boxes[:, 3]) / (img_h / gh)
    w = (boxes[:, 2] - boxes[:, 0]) / (img_w / gw)
    h = (boxes[:, 3] - boxes[:, 1]) / (img_h / gh)

    gx = np.floor(cx).astype(np.int64)
    gy = np.floor(cy).astype(np.int64)
    in_grid = (gx < gw) & (gy < gh) & (gx >= 0) & (gy >= 0)

    cx, cy, w, h = cx[in_grid], cy[in_grid], w[in_grid], h[in_grid]
    gx, gy = gx[in_grid], gy[in_grid]
    classes = classes[in_grid]
    if cx.shape[0] == 0:
        return target, true_boxes

    best_anchor = np.argmax(wh_iou(np.stack([w, h], axis=1), anchors), axis=1)

    # scatter, in order, so later instances overwrite earlier ones like the
    # reference's loop
    for i in range(cx.shape[0]):
        target[gy[i], gx[i], best_anchor[i], 0:4] = [cx[i], cy[i], w[i], h[i]]
        target[gy[i], gx[i], best_anchor[i], 4] = 1.0
        target[gy[i], gx[i], best_anchor[i], 5:] = 0.0
        target[gy[i], gx[i], best_anchor[i], 5 + int(classes[i])] = 1.0
        true_boxes[0, 0, 0, i % config.TRUE_BOX_BUFFER] = [cx[i], cy[i], w[i], h[i]]

    return target, true_boxes


def encode_batch(gt_boxes: np.ndarray, gt_class_ids: np.ndarray, config):
    """Vectorized-over-batch encoding: [B, G, 4] px boxes + [B, G] ids →
    (yolo_target [B, gh, gw, nb, 5+C], true_boxes [B, 1, 1, 1, T, 4])."""
    b = gt_boxes.shape[0]
    targets = np.zeros(
        (b, config.GRID_H, config.GRID_W, config.N_BOX, 5 + config.NUM_CLASSES),
        dtype=np.float32,
    )
    tboxes = np.zeros((b, 1, 1, 1, config.TRUE_BOX_BUFFER, 4), dtype=np.float32)
    for i in range(b):
        targets[i], tboxes[i] = encode_yolo_targets(gt_boxes[i], gt_class_ids[i], config)
    return targets, tboxes
