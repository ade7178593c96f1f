"""Loss functions — pure, jittable, multi-replica-safe.

Reproduces the reference's loss semantics exactly:

 * `yolo_loss` — the YOLOv2 multi-part sum loss of yolo_custom_loss
   (/root/reference/myolo/model.py:86-242): masked MSE on (x, y) and (w, h)
   of responsible anchors, IoU-weighted confidence MSE with a 0.6-IoU
   no-object suppression against the true-box buffer, and per-cell softmax
   cross-entropy on classes. Differences from the reference, by design:
     - the warm-up counter `seen` is an explicit step argument instead of a
       mutable tf.Variable (model.py:99,197) — the reference's in-graph
       assign_add is unsound under replication (SURVEY.md §7 "Hard parts");
     - the in-graph tf.Print debugging (model.py:234-240) becomes a returned
       metrics dict;
     - recall is a returned metric, not a side effect.

 * `mask_loss` — binary cross-entropy on positive ROIs only, class-specific
   channel selected per ROI (myolo_mask_loss_graph, model.py:718-754), in
   fixed shape: gathers become one-hot contractions and the "positive only"
   selection is a weighted mean whose padded terms are exactly zero.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .ops.boxes import _cell_grid


def _pairwise_iou_xywh(xy1, wh1, xy2, wh2):
    """IoU of center/size boxes, broadcasting. All in grid units."""
    mins1, maxs1 = xy1 - wh1 / 2.0, xy1 + wh1 / 2.0
    mins2, maxs2 = xy2 - wh2 / 2.0, xy2 + wh2 / 2.0
    imins = jnp.maximum(mins1, mins2)
    imaxs = jnp.minimum(maxs1, maxs2)
    iwh = jnp.maximum(imaxs - imins, 0.0)
    inter = iwh[..., 0] * iwh[..., 1]
    a1 = wh1[..., 0] * wh1[..., 1]
    a2 = wh2[..., 0] * wh2[..., 1]
    return inter / (a1 + a2 - inter)


@functools.partial(jax.jit, static_argnums=(3,))
def yolo_loss(y_true, y_pred, true_boxes, config, seen: jnp.ndarray | float = 1e9):
    """YOLOv2 composite loss.

    y_true: [B, gh, gw, nb, 5+C] grid targets (grid-unit xywh, conf, one-hot).
    y_pred: [B, gh, gw, nb, 5+C] raw network output.
    true_boxes: [B, 1, 1, 1, T, 4] GT boxes in grid units (cx, cy, w, h).
    seen: scalar — number of batches seen, drives the warm-up phase.

    Returns (loss, metrics) where metrics contains the per-component losses
    and the recall diagnostics the reference printed in-graph.
    """
    gh, gw, nb = config.GRID_H, config.GRID_W, config.N_BOX
    anchors = jnp.asarray(config.anchors_wh, dtype=y_pred.dtype)  # [nb, 2]
    anchors_b = anchors[None, None, None, :, :]
    cell_grid = jnp.asarray(_cell_grid(gh, gw), dtype=y_pred.dtype)[None]  # [1,gh,gw,1,2]

    # --- adjust prediction (model.py:102-115)
    pred_xy = jax.nn.sigmoid(y_pred[..., 0:2]) + cell_grid
    # twh clamp: inactive in the trained regime (|twh| < ~3) but prevents the
    # reference loss's divergence mode where one bad step pushes twh past
    # ~88 and exp() overflows to inf, permanently NaN-ing Adam state
    # (observed at epoch 35 of a 40-epoch Shapes run)
    pred_wh = jnp.exp(jnp.clip(y_pred[..., 2:4], -8.0, 8.0)) * anchors_b
    pred_conf = jax.nn.sigmoid(y_pred[..., 4])
    pred_class = y_pred[..., 5:]

    # --- adjust ground truth (model.py:117-149)
    true_xy = y_true[..., 0:2]
    true_wh = y_true[..., 2:4]
    iou_resp = _pairwise_iou_xywh(true_xy, true_wh, pred_xy, pred_wh)
    true_conf = iou_resp * y_true[..., 4]
    true_class = jnp.argmax(y_true[..., 5:], axis=-1)

    # --- masks (model.py:151-191)
    coord_mask = y_true[..., 4:5] * config.COORD_SCALE

    # no-object suppression: best IoU of each prediction against the GT buffer
    tb_xy = true_boxes[..., 0:2]  # [B,1,1,1,T,2]
    tb_wh = true_boxes[..., 2:4]
    best_ious = jnp.max(
        _pairwise_iou_xywh(pred_xy[..., None, :], pred_wh[..., None, :], tb_xy, tb_wh),
        axis=-1,
    )
    conf_mask = (
        (best_ious < 0.6).astype(y_pred.dtype)
        * (1.0 - y_true[..., 4])
        * config.NO_OBJECT_SCALE
        + y_true[..., 4] * config.OBJECT_SCALE
    )

    class_weights = jnp.asarray(config.class_weights, dtype=y_pred.dtype)
    class_mask = y_true[..., 4] * class_weights[true_class] * config.CLASS_SCALE

    # --- warm-up (model.py:193-207), driven by the explicit `seen` counter
    warm = jnp.asarray(seen, dtype=y_pred.dtype) < float(config.WARM_UP_BATCHES)
    no_boxes_mask = (coord_mask < config.COORD_SCALE / 2.0).astype(y_pred.dtype)
    true_xy = jnp.where(warm, true_xy + (0.5 + cell_grid) * no_boxes_mask, true_xy)
    true_wh = jnp.where(warm, true_wh + anchors_b * no_boxes_mask, true_wh)
    coord_mask = jnp.where(warm, jnp.ones_like(coord_mask), coord_mask)

    # --- finalize (model.py:209-222)
    nb_coord = jnp.sum((coord_mask > 0.0).astype(y_pred.dtype))
    nb_conf = jnp.sum((conf_mask > 0.0).astype(y_pred.dtype))
    nb_class = jnp.sum((class_mask > 0.0).astype(y_pred.dtype))

    loss_xy = jnp.sum(jnp.square(true_xy - pred_xy) * coord_mask) / (nb_coord + 1e-6) / 2.0
    loss_wh = jnp.sum(jnp.square(true_wh - pred_wh) * coord_mask) / (nb_coord + 1e-6) / 2.0
    loss_conf = jnp.sum(jnp.square(true_conf - pred_conf) * conf_mask) / (nb_conf + 1e-6) / 2.0
    ce = -jax.nn.log_softmax(pred_class, axis=-1)
    ce = jnp.take_along_axis(ce, true_class[..., None], axis=-1)[..., 0]
    loss_class = jnp.sum(ce * class_mask) / (nb_class + 1e-6)

    loss = loss_xy + loss_wh + loss_conf + loss_class

    # --- diagnostics (model.py:224-231)
    nb_true_box = jnp.sum(y_true[..., 4])
    nb_pred_box = jnp.sum(
        (true_conf > 0.5).astype(y_pred.dtype) * (pred_conf > 0.3).astype(y_pred.dtype)
    )
    recall = nb_pred_box / (nb_true_box + 1e-6)

    metrics = {
        "loss_xy": loss_xy,
        "loss_wh": loss_wh,
        "loss_conf": loss_conf,
        "loss_class": loss_class,
        "yolo_sum_loss": loss,
        "recall": recall,
    }
    return loss, metrics


@jax.jit
def mask_loss(target_masks, target_class_ids, pred_masks):
    """Mask head binary cross-entropy (reference model.py:718-754).

    target_masks: [B, R, mh, mw] float 0/1, zero-padded.
    target_class_ids: [B, R] int, 0 for negatives/padding.
    pred_masks: [B, R, mh, mw, C] sigmoid probabilities.

    Only positive ROIs (class > 0) contribute; each contributes only its
    target-class channel. Mean over positive-ROI pixels; 0 if no positives —
    this matches K.mean over the gathered [P, mh, mw] tensor.
    """
    b, r, mh, mw, c = pred_masks.shape
    positive = (target_class_ids > 0).astype(pred_masks.dtype)  # [B, R]

    # class-channel select as one-hot contraction (gather_nd equivalent,
    # model.py:742-746)
    onehot = jax.nn.one_hot(target_class_ids, c, dtype=pred_masks.dtype)
    y_pred = jnp.einsum("brhwc,brc->brhw", pred_masks, onehot)

    # Keras binary_crossentropy clips probabilities to [eps, 1-eps]
    eps = 1e-7
    y_pred = jnp.clip(y_pred, eps, 1.0 - eps)
    y_true = target_masks.astype(pred_masks.dtype)
    bce = -(y_true * jnp.log(y_pred) + (1.0 - y_true) * jnp.log(1.0 - y_pred))

    num_pos = jnp.sum(positive)
    total = jnp.sum(bce * positive[..., None, None])
    denom = num_pos * mh * mw
    return jnp.where(num_pos > 0, total / jnp.maximum(denom, 1.0), 0.0)
