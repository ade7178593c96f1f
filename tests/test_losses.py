"""Loss golden tests: device losses vs straightforward numpy ports of the
reference formulas (model.py:86-242 yolo, 718-754 mask)."""

import jax.numpy as jnp
import numpy as np

from mask_yolo_tpu.losses import mask_loss, yolo_loss


def np_sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def numpy_yolo_loss(y_true, y_pred, true_boxes, cfg, seen=1e9):
    """Literal numpy port of yolo_custom_loss (reference model.py:86-242)."""
    gh, gw, nb = cfg.GRID_H, cfg.GRID_W, cfg.N_BOX
    anchors = cfg.anchors_wh.reshape(1, 1, 1, nb, 2)
    cols = np.tile(np.arange(gw, dtype=np.float32)[None, :], (gh, 1))
    rows = np.tile(np.arange(gh, dtype=np.float32)[:, None], (1, gw))
    cell = np.stack([cols, rows], -1)[None, :, :, None, :]

    pred_xy = np_sigmoid(y_pred[..., :2]) + cell
    pred_wh = np.exp(y_pred[..., 2:4]) * anchors
    pred_conf = np_sigmoid(y_pred[..., 4])
    pred_class = y_pred[..., 5:]

    true_xy = y_true[..., 0:2].copy()
    true_wh = y_true[..., 2:4].copy()

    def iou(xy1, wh1, xy2, wh2):
        mins1, maxs1 = xy1 - wh1 / 2, xy1 + wh1 / 2
        mins2, maxs2 = xy2 - wh2 / 2, xy2 + wh2 / 2
        iwh = np.maximum(np.minimum(maxs1, maxs2) - np.maximum(mins1, mins2), 0)
        inter = iwh[..., 0] * iwh[..., 1]
        return inter / (wh1[..., 0] * wh1[..., 1] + wh2[..., 0] * wh2[..., 1] - inter)

    true_conf = iou(true_xy, true_wh, pred_xy, pred_wh) * y_true[..., 4]
    true_class = np.argmax(y_true[..., 5:], -1)

    coord_mask = y_true[..., 4:5] * cfg.COORD_SCALE
    best_ious = np.max(
        iou(pred_xy[..., None, :], pred_wh[..., None, :],
            true_boxes[..., 0:2], true_boxes[..., 2:4]),
        axis=-1)
    conf_mask = ((best_ious < 0.6) * (1 - y_true[..., 4]) * cfg.NO_OBJECT_SCALE
                 + y_true[..., 4] * cfg.OBJECT_SCALE)
    class_mask = y_true[..., 4] * cfg.class_weights[true_class] * cfg.CLASS_SCALE

    if seen < cfg.WARM_UP_BATCHES:
        nbm = (coord_mask < cfg.COORD_SCALE / 2.0).astype(np.float32)
        true_xy = true_xy + (0.5 + cell) * nbm
        true_wh = true_wh + anchors * nbm
        coord_mask = np.ones_like(coord_mask)

    nb_coord = np.sum(coord_mask > 0)
    nb_conf = np.sum(conf_mask > 0)
    nb_class = np.sum(class_mask > 0)
    loss_xy = np.sum(np.square(true_xy - pred_xy) * coord_mask) / (nb_coord + 1e-6) / 2
    loss_wh = np.sum(np.square(true_wh - pred_wh) * coord_mask) / (nb_coord + 1e-6) / 2
    loss_conf = np.sum(np.square(true_conf - pred_conf) * conf_mask) / (nb_conf + 1e-6) / 2
    sm = np.exp(pred_class - pred_class.max(-1, keepdims=True))
    sm = sm / sm.sum(-1, keepdims=True)
    ce = -np.log(np.take_along_axis(sm, true_class[..., None], -1)[..., 0] + 1e-30)
    loss_class = np.sum(ce * class_mask) / (nb_class + 1e-6)
    return float(loss_xy + loss_wh + loss_conf + loss_class), dict(
        loss_xy=loss_xy, loss_wh=loss_wh, loss_conf=loss_conf, loss_class=loss_class)


def random_inputs(rng, cfg, b=2):
    gh, gw, nb, nc = cfg.GRID_H, cfg.GRID_W, cfg.N_BOX, cfg.NUM_CLASSES
    y_pred = rng.randn(b, gh, gw, nb, 5 + nc).astype(np.float32)
    y_true = np.zeros_like(y_pred)
    tb = np.zeros((b, 1, 1, 1, cfg.TRUE_BOX_BUFFER, 4), dtype=np.float32)
    for i in range(b):
        for k in range(rng.randint(1, 3)):
            gy, gx, a = rng.randint(0, gh), rng.randint(0, gw), rng.randint(0, nb)
            box = [gx + rng.rand(), gy + rng.rand(),
                   0.3 + rng.rand(), 0.3 + rng.rand()]
            y_true[i, gy, gx, a, 0:4] = box
            y_true[i, gy, gx, a, 4] = 1.0
            y_true[i, gy, gx, a, 5 + rng.randint(1, nc)] = 1.0
            tb[i, 0, 0, 0, k] = box
    return y_true, y_pred, tb


def test_yolo_loss_matches_numpy(tiny_config, rng):
    for _ in range(5):
        y_true, y_pred, tb = random_inputs(rng, tiny_config)
        loss, metrics = yolo_loss(jnp.asarray(y_true), jnp.asarray(y_pred),
                                  jnp.asarray(tb), tiny_config, seen=1e9)
        exp, exp_m = numpy_yolo_loss(y_true, y_pred, tb, tiny_config)
        np.testing.assert_allclose(float(loss), exp, rtol=1e-4)
        for k in ("loss_xy", "loss_wh", "loss_conf", "loss_class"):
            np.testing.assert_allclose(float(metrics[k]), exp_m[k], rtol=1e-4,
                                       atol=1e-6)


def test_yolo_loss_warmup(tiny_config, rng):
    class Warm(type(tiny_config)):
        WARM_UP_BATCHES = 100

    cfg = Warm()
    y_true, y_pred, tb = random_inputs(rng, cfg)
    loss_w, _ = yolo_loss(jnp.asarray(y_true), jnp.asarray(y_pred),
                          jnp.asarray(tb), cfg, seen=0)
    exp, _ = numpy_yolo_loss(y_true, y_pred, tb, cfg, seen=0)
    np.testing.assert_allclose(float(loss_w), exp, rtol=1e-4)
    # warm-up path differs from the post-warm-up path
    loss_after, _ = yolo_loss(jnp.asarray(y_true), jnp.asarray(y_pred),
                              jnp.asarray(tb), cfg, seen=1000)
    assert abs(float(loss_w) - float(loss_after)) > 1e-6


def test_mask_loss_positive_only(rng):
    b, r, mh, mw, c = 2, 6, 8, 8, 3
    target = (rng.rand(b, r, mh, mw) > 0.5).astype(np.float32)
    classes = np.zeros((b, r), dtype=np.int32)
    classes[0, 1] = 2
    classes[1, 3] = 1
    pred = rng.rand(b, r, mh, mw, c).astype(np.float32) * 0.98 + 0.01
    got = float(mask_loss(jnp.asarray(target), jnp.asarray(classes), jnp.asarray(pred)))

    # numpy golden: mean BCE over positive ROIs' class channel
    eps = 1e-7
    vals = []
    for bi, ri in [(0, 1), (1, 3)]:
        p = np.clip(pred[bi, ri, :, :, classes[bi, ri]], eps, 1 - eps)
        t = target[bi, ri]
        vals.append(-(t * np.log(p) + (1 - t) * np.log(1 - p)))
    exp = float(np.mean(np.stack(vals)))
    np.testing.assert_allclose(got, exp, rtol=1e-5)


def test_mask_loss_no_positives_is_zero(rng):
    target = np.zeros((1, 4, 8, 8), dtype=np.float32)
    classes = np.zeros((1, 4), dtype=np.int32)
    pred = rng.rand(1, 4, 8, 8, 3).astype(np.float32)
    assert float(mask_loss(jnp.asarray(target), jnp.asarray(classes),
                           jnp.asarray(pred))) == 0.0


def test_mask_loss_padding_invariance(rng):
    """Adding zero-padded (negative) ROIs must not change the loss."""
    target = (rng.rand(1, 2, 8, 8) > 0.5).astype(np.float32)
    classes = np.array([[1, 2]], dtype=np.int32)
    pred = rng.rand(1, 2, 8, 8, 3).astype(np.float32) * 0.9 + 0.05
    base = float(mask_loss(jnp.asarray(target), jnp.asarray(classes), jnp.asarray(pred)))

    target2 = np.concatenate([target, np.zeros((1, 3, 8, 8), np.float32)], axis=1)
    classes2 = np.concatenate([classes, np.zeros((1, 3), np.int32)], axis=1)
    pred2 = np.concatenate([pred, rng.rand(1, 3, 8, 8, 3).astype(np.float32)], axis=1)
    padded = float(mask_loss(jnp.asarray(target2), jnp.asarray(classes2),
                             jnp.asarray(pred2)))
    np.testing.assert_allclose(base, padded, rtol=1e-6)


def test_loss_finite_under_extreme_predictions(tiny_config):
    """exp(twh) clamp: even pathological raw grids give a finite loss."""
    import jax.numpy as jnp

    from mask_yolo_tpu.losses import yolo_loss

    cfg = tiny_config
    gh, gw, nb, nc = cfg.GRID_H, cfg.GRID_W, cfg.N_BOX, cfg.NUM_CLASSES
    y_true = np.zeros((1, gh, gw, nb, 5 + nc), np.float32)
    y_true[0, 0, 0, 0] = [0.5, 0.5, 1.0, 1.0, 1.0] + [1.0] + [0.0] * (nc - 1)
    true_boxes = np.zeros((1, 1, 1, 1, cfg.TRUE_BOX_BUFFER, 4), np.float32)
    y_pred = np.full((1, gh, gw, nb, 5 + nc), 500.0, np.float32)  # exp(500)!
    loss, metrics = yolo_loss(jnp.asarray(y_true), jnp.asarray(y_pred),
                              jnp.asarray(true_boxes), cfg, seen=1e9)
    assert np.isfinite(float(loss))


def test_optimizer_zeroes_nonfinite_grads(tiny_config):
    import jax.numpy as jnp
    import optax

    from mask_yolo_tpu.train.state import make_optimizer

    tx = make_optimizer(1e-3, tiny_config)
    params = {"w": jnp.ones(3)}
    state = tx.init(params)
    grads = {"w": jnp.asarray([1.0, np.nan, np.inf])}
    updates, _ = tx.update(grads, state, params)
    u = np.asarray(updates["w"])
    assert np.isfinite(u).all()
    assert u[1] == 0.0 and u[2] == 0.0  # nan/inf grads contribute nothing
