"""Encoder golden test: the vectorized target encoder must reproduce the
reference's per-instance loop semantics (myolo_utils.py:769-820), including
last-writer-wins on (cell, anchor) collisions."""

import numpy as np

from mask_yolo_tpu.data.encoder import encode_batch, encode_yolo_targets, wh_iou


def loop_reference_encoder(gt_boxes, gt_class_ids, config):
    """Direct port of the reference's BatchGenerator loop for testing."""
    gh, gw, nb, nc = config.GRID_H, config.GRID_W, config.N_BOX, config.NUM_CLASSES
    target = np.zeros((gh, gw, nb, 5 + nc), dtype=np.float32)
    tboxes = np.zeros((1, 1, 1, config.TRUE_BOX_BUFFER, 4), dtype=np.float32)
    anchors = config.anchors_wh
    tbi = 0
    for i in range(gt_boxes.shape[0]):
        x1, y1, x2, y2 = gt_boxes[i]
        if abs(x1) + abs(y1) + abs(x2) + abs(y2) == 0:
            continue
        cx = 0.5 * (x1 + x2) / (config.IMAGE_SHAPE[0] / gw)
        cy = 0.5 * (y1 + y2) / (config.IMAGE_SHAPE[1] / gh)
        gx, gy = int(np.floor(cx)), int(np.floor(cy))
        if gx < gw and gy < gh:
            w = (x2 - x1) / (config.IMAGE_SHAPE[0] / gw)
            h = (y2 - y1) / (config.IMAGE_SHAPE[1] / gh)
            best, best_iou = -1, -1
            for a in range(nb):
                aw, ah = anchors[a]
                inter = min(w, aw) * min(h, ah)
                union = w * h + aw * ah - inter
                iou = inter / union
                if iou > best_iou:
                    best, best_iou = a, iou
            target[gy, gx, best, 0:4] = [cx, cy, w, h]
            target[gy, gx, best, 4] = 1.0
            target[gy, gx, best, 5:] = 0.0
            target[gy, gx, best, 5 + int(gt_class_ids[i])] = 1.0
            tboxes[0, 0, 0, tbi % config.TRUE_BOX_BUFFER] = [cx, cy, w, h]
            tbi += 1
    return target, tboxes


def random_gt(rng, config, n):
    g = config.MAX_GT_INSTANCES
    boxes = np.zeros((g, 4), dtype=np.float32)
    ids = np.zeros((g,), dtype=np.int32)
    size = config.IMAGE_SHAPE[0]
    for i in range(n):
        x1, y1 = rng.randint(0, size - 12, 2)
        w, h = rng.randint(4, size // 2, 2)
        boxes[i] = [x1, y1, min(x1 + w, size), min(y1 + h, size)]
        ids[i] = rng.randint(1, config.NUM_CLASSES)
    return boxes, ids


def test_encoder_matches_loop_reference(tiny_config, rng):
    for trial in range(20):
        n = rng.randint(0, tiny_config.MAX_GT_INSTANCES + 1)
        boxes, ids = random_gt(rng, tiny_config, n)
        got_t, got_b = encode_yolo_targets(boxes, ids, tiny_config)
        exp_t, exp_b = loop_reference_encoder(boxes, ids, tiny_config)
        np.testing.assert_allclose(got_t, exp_t, atol=1e-6)
        np.testing.assert_allclose(got_b, exp_b, atol=1e-6)


def test_encoder_conf_count(tiny_config, rng):
    boxes, ids = random_gt(rng, tiny_config, 3)
    t, _ = encode_yolo_targets(boxes, ids, tiny_config)
    # at most one responsible anchor per GT (collisions can reduce the count)
    assert 1 <= t[..., 4].sum() <= 3


def test_wh_iou_basic():
    wh = np.array([[2.0, 2.0]])
    anchors = np.array([[2.0, 2.0], [1.0, 1.0], [4.0, 4.0]])
    iou = wh_iou(wh, anchors)[0]
    assert abs(iou[0] - 1.0) < 1e-9
    assert abs(iou[1] - 0.25) < 1e-9
    assert abs(iou[2] - 0.25) < 1e-9


def test_encode_batch_shapes(tiny_config, rng):
    boxes = np.stack([random_gt(rng, tiny_config, 2)[0] for _ in range(3)])
    ids = np.stack([random_gt(rng, tiny_config, 2)[1] for _ in range(3)])
    t, b = encode_batch(boxes, ids, tiny_config)
    assert t.shape == (3, 2, 2, 2, 5 + 3)
    assert b.shape == (3, 1, 1, 1, 4, 4)
