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
        # IMAGE_SHAPE is [H, W, 3]: x spans width, y spans height
        cx = 0.5 * (x1 + x2) / (config.IMAGE_SHAPE[1] / gw)
        cy = 0.5 * (y1 + y2) / (config.IMAGE_SHAPE[0] / gh)
        gx, gy = int(np.floor(cx)), int(np.floor(cy))
        if gx < gw and gy < gh:
            w = (x2 - x1) / (config.IMAGE_SHAPE[1] / gw)
            h = (y2 - y1) / (config.IMAGE_SHAPE[0] / gh)
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


def test_encoder_collisions_last_writer_wins(tiny_config):
    """Two GT boxes in the same cell mapping to the same anchor: the later
    instance must own the slot, exactly like the reference's write loop."""
    boxes = np.zeros((tiny_config.MAX_GT_INSTANCES, 4), dtype=np.float32)
    ids = np.zeros((tiny_config.MAX_GT_INSTANCES,), dtype=np.int32)
    # both centers in cell (0, 0), same aspect so same best anchor
    boxes[0] = [2, 2, 22, 22]
    boxes[1] = [4, 4, 24, 24]
    ids[0], ids[1] = 1, 2
    got_t, got_b = encode_yolo_targets(boxes, ids, tiny_config)
    exp_t, exp_b = loop_reference_encoder(boxes, ids, tiny_config)
    np.testing.assert_allclose(got_t, exp_t, atol=1e-6)
    np.testing.assert_allclose(got_b, exp_b, atol=1e-6)
    # the winning cell carries class 2 (instance 1)
    cell = got_t[0, 0]
    anchor = int(cell[:, 4].argmax())
    assert cell[anchor, 5 + 2] == 1.0 and cell[anchor, 5 + 1] == 0.0


def test_encoder_rectangular_image(rng):
    """Non-square IMAGE_SHAPE (H=64, W=96, grid 2x3): vectorized encoder must
    match the loop oracle with per-axis pixel-to-grid conversion."""
    from mask_yolo_tpu.config import Config

    class RectConfig(Config):
        NAME = "rect"
        LABELS = ["background", "a", "b"]
        NUM_CLASSES = 3
        IMAGE_SHAPE = [64, 96, 3]
        IMAGE_MIN_DIM = 64
        IMAGE_MAX_DIM = 96
        GRID_H, GRID_W = 2, 3
        N_BOX = 2
        ANCHORS = [0.6, 0.7, 1.2, 1.1]
        TRUE_BOX_BUFFER = 4
        MAX_GT_INSTANCES = 4

    cfg = RectConfig()
    for _ in range(10):
        boxes = np.zeros((cfg.MAX_GT_INSTANCES, 4), dtype=np.float32)
        ids = np.zeros((cfg.MAX_GT_INSTANCES,), dtype=np.int32)
        n = rng.randint(1, cfg.MAX_GT_INSTANCES + 1)
        for i in range(n):
            x1 = rng.randint(0, 96 - 12)
            y1 = rng.randint(0, 64 - 12)
            w = rng.randint(4, 48)
            h = rng.randint(4, 32)
            boxes[i] = [x1, y1, min(x1 + w, 96), min(y1 + h, 64)]
            ids[i] = rng.randint(1, cfg.NUM_CLASSES)
        got_t, got_b = encode_yolo_targets(boxes, ids, cfg)
        exp_t, exp_b = loop_reference_encoder(boxes, ids, cfg)
        np.testing.assert_allclose(got_t, exp_t, atol=1e-6)
        np.testing.assert_allclose(got_b, exp_b, atol=1e-6)
    # a full-width box must decode to w == GRID_W grid units, h == GRID_H
    boxes = np.zeros((cfg.MAX_GT_INSTANCES, 4), dtype=np.float32)
    ids = np.zeros((cfg.MAX_GT_INSTANCES,), dtype=np.int32)
    boxes[0] = [0, 0, 96, 64]
    ids[0] = 1
    t, _ = encode_yolo_targets(boxes, ids, cfg)
    gy, gx, a = 0, 1, 0  # center (48, 32) px → cell (x=1 of 3, y=0... )
    # find the written slot instead of hand-deriving it
    where = np.argwhere(t[..., 4] == 1.0)
    assert len(where) == 1
    gy, gx, a = where[0]
    assert abs(t[gy, gx, a, 2] - cfg.GRID_W) < 1e-5  # w in grid units
    assert abs(t[gy, gx, a, 3] - cfg.GRID_H) < 1e-5  # h in grid units


def test_encode_batch_matches_per_image(tiny_config, rng):
    """Batch scatter == per-image encoding, on data with collisions."""
    from mask_yolo_tpu.data.encoder import _encode_yolo_targets_loop

    b = 4
    boxes = np.stack([random_gt(rng, tiny_config, rng.randint(0, 5))[0]
                      for _ in range(b)])
    ids = np.stack([random_gt(rng, tiny_config, rng.randint(0, 5))[1]
                    for _ in range(b)])
    got_t, got_b = encode_batch(boxes, ids, tiny_config)
    for i in range(b):
        exp_t, exp_b = _encode_yolo_targets_loop(boxes[i], ids[i], tiny_config)
        np.testing.assert_allclose(got_t[i], exp_t, atol=1e-6)
        np.testing.assert_allclose(got_b[i], exp_b, atol=1e-6)


def test_encode_batch_shapes(tiny_config, rng):
    boxes = np.stack([random_gt(rng, tiny_config, 2)[0] for _ in range(3)])
    ids = np.stack([random_gt(rng, tiny_config, 2)[1] for _ in range(3)])
    t, b = encode_batch(boxes, ids, tiny_config)
    assert t.shape == (3, 2, 2, 2, 5 + 3)
    assert b.shape == (3, 1, 1, 1, 4, 4)
