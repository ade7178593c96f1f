"""Decode golden tests: device grid decoding vs the numpy formulas the
reference uses on host (myolo_utils.py:54-62) and on device
(model.py:1442-1541)."""

import jax.numpy as jnp
import numpy as np

from mask_yolo_tpu.ops.boxes import (box_iou_matrix, decode_detections,
                                     decode_yolo_proposals, denorm_boxes,
                                     norm_boxes)


def np_sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def numpy_decode(y_pred, anchors, gh, gw):
    """Port of the decode formulas (reference myolo_utils.py:54-62)."""
    b, _, _, nb, _ = y_pred.shape
    out = np.zeros((b, gh * gw * nb, 4), dtype=np.float64)
    for bi in range(b):
        k = 0
        for row in range(gh):
            for col in range(gw):
                for a in range(nb):
                    tx, ty, tw, th = y_pred[bi, row, col, a, :4]
                    x = (col + np_sigmoid(tx)) / gw
                    y = (row + np_sigmoid(ty)) / gh
                    w = anchors[a, 0] * np.exp(tw) / gw
                    h = anchors[a, 1] * np.exp(th) / gh
                    out[bi, k] = [x - w / 2, y - h / 2, x + w / 2, y + h / 2]
                    k += 1
    return out


def test_decode_proposals_matches_numpy(tiny_config, rng):
    cfg = tiny_config
    y = rng.randn(2, cfg.GRID_H, cfg.GRID_W, cfg.N_BOX, 5 + cfg.NUM_CLASSES)
    y = y.astype(np.float32)
    got = np.asarray(decode_yolo_proposals(jnp.asarray(y), cfg.anchors_wh,
                                           cfg.GRID_H, cfg.GRID_W))
    exp = numpy_decode(y, cfg.anchors_wh, cfg.GRID_H, cfg.GRID_W)
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-6)


def test_decode_detections_scores_and_classes(tiny_config, rng):
    cfg = tiny_config
    y = rng.randn(1, cfg.GRID_H, cfg.GRID_W, cfg.N_BOX, 5 + cfg.NUM_CLASSES)
    y = y.astype(np.float32)
    det = np.asarray(decode_detections(jnp.asarray(y), cfg.anchors_wh,
                                       cfg.GRID_H, cfg.GRID_W))
    assert det.shape == (1, cfg.grid_boxes, 6)
    flat_conf = np_sigmoid(y[..., 4].reshape(1, -1))
    np.testing.assert_allclose(det[..., 4], flat_conf, rtol=1e-5)
    flat_cls = np.argmax(y[..., 5:], -1).reshape(1, -1)
    np.testing.assert_array_equal(det[..., 5].astype(int), flat_cls)


def test_iou_matrix_known_values():
    a = jnp.asarray([[0.0, 0.0, 2.0, 2.0]])
    b = jnp.asarray([[0.0, 0.0, 2.0, 2.0], [1.0, 1.0, 3.0, 3.0],
                     [5.0, 5.0, 6.0, 6.0]])
    iou = np.asarray(box_iou_matrix(a, b))[0]
    np.testing.assert_allclose(iou, [1.0, 1.0 / 7.0, 0.0], atol=1e-6)


def test_norm_denorm_roundtrip(rng):
    boxes = rng.rand(5, 4).astype(np.float32) * 200
    n = norm_boxes(jnp.asarray(boxes), (224, 224))
    d = np.asarray(denorm_boxes(n, (224, 224)))
    np.testing.assert_allclose(d, boxes, rtol=1e-5, atol=1e-4)


def test_norm_boxes_matches_reference_formula():
    # reference model.py:1394-1408: (box - [0,0,1,1]) / (dim - 1)
    boxes = jnp.asarray([[0.0, 0.0, 224.0, 224.0]])
    n = np.asarray(norm_boxes(boxes, (224, 224)))[0]
    np.testing.assert_allclose(n, [0.0, 0.0, 1.0, 1.0], atol=1e-7)
