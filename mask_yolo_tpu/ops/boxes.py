"""Box geometry + YOLO grid decoding as pure jittable functions.

Device-side equivalents of the reference's DecodeYOLOLayer
(/root/reference/myolo/model.py:1429-1476), DetectionsLayer
(model.py:1479-1541), overlaps_graph (model.py:420-454) and norm_boxes_graph
(model.py:1394-1408). Everything is static-shape and batched; the cell grid is
a compile-time constant folded by XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _cell_grid(grid_h: int, grid_w: int) -> np.ndarray:
    """[grid_h, grid_w, 1, 2] (col, row) offsets — the YOLOv2 cell grid."""
    cols = np.tile(np.arange(grid_w, dtype=np.float32)[None, :], (grid_h, 1))
    rows = np.tile(np.arange(grid_h, dtype=np.float32)[:, None], (1, grid_w))
    return np.stack([cols, rows], axis=-1)[:, :, None, :]


def decode_grid(y_pred, anchors_wh, grid_h: int, grid_w: int):
    """Raw YOLO grid → (xy, wh) in grid units.

    y_pred: [..., grid_h, grid_w, n_box, 5+C]
    anchors_wh: [n_box, 2] anchor priors in grid units.
    Returns (xy [..., gh, gw, nb, 2], wh [..., gh, gw, nb, 2]).

    Matches the YOLOv2 formulas used across the reference
    (model.py:106-109, 1453-1459): xy = sigmoid(txy) + cell, wh = exp(twh) * prior.
    """
    cell = jnp.asarray(_cell_grid(grid_h, grid_w), dtype=y_pred.dtype)
    anchors = jnp.asarray(anchors_wh, dtype=y_pred.dtype)[None, None, :, :]
    xy = jax_sigmoid(y_pred[..., 0:2]) + cell
    wh = jnp.exp(y_pred[..., 2:4]) * anchors
    return xy, wh


def jax_sigmoid(x):
    return 1.0 / (1.0 + jnp.exp(-x))


@functools.partial(jax.jit, static_argnums=(2, 3))
def decode_yolo_proposals(y_pred, anchors_wh, grid_h: int, grid_w: int):
    """DecodeYOLOLayer equivalent: raw grid → [B, gh*gw*nb, 4] normalized
    (x1, y1, x2, y2) boxes (reference: model.py:1429-1476).

    Note the reference normalizes both axes by GRID_W (model.py:1454,1459);
    we normalize x by grid_w and y by grid_h — identical for the square grids
    every config uses, and correct for non-square ones.
    """
    xy, wh = decode_grid(y_pred, anchors_wh, grid_h, grid_w)
    norm = jnp.asarray([grid_w, grid_h], dtype=y_pred.dtype)
    xy = xy / norm
    wh = wh / norm
    mins = xy - wh / 2.0
    maxes = xy + wh / 2.0
    boxes = jnp.concatenate([mins, maxes], axis=-1)
    b = boxes.shape[0]
    return boxes.reshape(b, grid_h * grid_w * boxes.shape[3], 4)


@functools.partial(jax.jit, static_argnums=(2, 3))
def decode_detections(y_pred, anchors_wh, grid_h: int, grid_w: int):
    """DetectionsLayer equivalent: raw grid → [B, gh*gw*nb, 6]
    (x1, y1, x2, y2, score, class_id) normalized (reference: model.py:1479-1541).

    score = sigmoid(conf); class_id = argmax over class logits. No NMS here —
    see ops/nms.py for the on-device suppression the reference did on host.
    """
    boxes = decode_yolo_proposals(y_pred, anchors_wh, grid_h, grid_w)
    b = y_pred.shape[0]
    conf = jax_sigmoid(y_pred[..., 4]).reshape(b, -1, 1)
    cls = jnp.argmax(y_pred[..., 5:], axis=-1).astype(y_pred.dtype).reshape(b, -1, 1)
    return jnp.concatenate([boxes, conf, cls], axis=-1)


@jax.jit
def box_iou_matrix(boxes1, boxes2):
    """IoU matrix between two box sets, [N, 4] x [M, 4] → [N, M].

    Boxes are (x1, y1, x2, y2). Equivalent to overlaps_graph
    (reference model.py:420-454) without the tile/reshape dance — plain
    broadcasting, which XLA fuses into one elementwise kernel.
    """
    b1 = boxes1[:, None, :]  # [N, 1, 4]
    b2 = boxes2[None, :, :]  # [1, M, 4]
    x1 = jnp.maximum(b1[..., 0], b2[..., 0])
    y1 = jnp.maximum(b1[..., 1], b2[..., 1])
    x2 = jnp.minimum(b1[..., 2], b2[..., 2])
    y2 = jnp.minimum(b1[..., 3], b2[..., 3])
    inter = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    area1 = (b1[..., 2] - b1[..., 0]) * (b1[..., 3] - b1[..., 1])
    area2 = (b2[..., 2] - b2[..., 0]) * (b2[..., 3] - b2[..., 1])
    union = area1 + area2 - inter
    return inter / union


@functools.partial(jax.jit, static_argnums=(1,))
def norm_boxes(boxes, shape):
    """Pixel → normalized coordinates, matching norm_boxes_graph
    (reference model.py:1394-1408): divide (box - [0,0,1,1]) by (dim - 1).

    boxes: [..., (x1, y1, x2, y2)] pixels; shape: (width, height).
    """
    w, h = shape
    scale = jnp.asarray([w, h, w, h], dtype=jnp.float32) - 1.0
    shift = jnp.asarray([0.0, 0.0, 1.0, 1.0], dtype=jnp.float32)
    return (boxes - shift) / scale


@functools.partial(jax.jit, static_argnums=(1,))
def denorm_boxes(boxes, shape):
    """Inverse of norm_boxes."""
    w, h = shape
    scale = jnp.asarray([w, h, w, h], dtype=jnp.float32) - 1.0
    shift = jnp.asarray([0.0, 0.0, 1.0, 1.0], dtype=jnp.float32)
    return boxes * scale + shift
