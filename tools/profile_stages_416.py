"""Stage-level timing of the int8 detect pipeline at the 416²/81-class
operating point (CocoStyleConfig) — the mask-branch complement of
tools/profile_layers_416.py (which covers the trunk per layer).

Cumulative prefixes of quant.QuantizedDetector's detect pipeline, delta-timed
with the bench.py harness; successive differences isolate per-stage cost:

  trunk       int8 backbone + neck + YOLO head (raw grid + fmap)
  +decode     + grid decode, zero-area filter, top-K, class NMS, reorder
  +crop       + ROIAlign crop of the MASK_TOP_K survivors from fmap
  +maskconvs  + the int8 mask conv stack (4 convs + deconv + class conv)
  +select     + one-hot class-channel selection
  full        + paste to 416² + threshold + validity (the shipped pipeline)

Run: python tools/profile_stages_416.py [--batch 128] [--stages a,b]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _checksum(out):
    s = jnp.float32(0)
    for v in jax.tree_util.tree_leaves(out):
        s = s + jnp.sum(v.astype(jnp.float32)) * jnp.float32(1e-6)
    return s


def bench(call, images, n1=4, n2=16, reps=5):
    float(call(images, n1))
    float(call(images, n2))
    ds = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(call(images, n1))
        t1 = time.perf_counter()
        float(call(images, n2))
        t2 = time.perf_counter()
        d = (t2 - t1) - (t1 - t0)
        if d > 0:
            ds.append(d / (n2 - n1))
    if not ds:
        raise RuntimeError("non-positive deltas")  # else NaN poisons the JSON
    return float(np.median(ds))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--stages", default=None)
    args = ap.parse_args()

    from mask_yolo_tpu import quant
    from mask_yolo_tpu.config import CocoStyleConfig
    from mask_yolo_tpu.models.network import MaskYoloNet
    from mask_yolo_tpu.ops.boxes import decode_detections
    from mask_yolo_tpu.ops.nms import index_order_class_nms_mask
    from mask_yolo_tpu.ops.roi_align import paste_masks
    from mask_yolo_tpu.quant import crop_and_resize

    cfg = CocoStyleConfig()
    net = MaskYoloNet(num_classes=cfg.NUM_CLASSES, n_box=cfg.N_BOX,
                      top_feature_map_depth=cfg.TOP_FEATURE_MAP_DEPTH,
                      mask_pool_size=cfg.MASK_POOL_SIZE, backbone=cfg.BACKBONE,
                      compute_dtype=cfg.COMPUTE_DTYPE,
                      image_hw=tuple(cfg.IMAGE_SHAPE[:2]))
    variables = jax.jit(lambda r, i, ro: net.init(r, i, ro, train=False))(
        jax.random.PRNGKey(0),
        jnp.zeros((1, *cfg.IMAGE_SHAPE), jnp.float32),
        jnp.zeros((1, 8, 4), jnp.float32))
    calib = np.random.RandomState(1).rand(4, *cfg.IMAGE_SHAPE).astype(np.float32)
    det = quant.QuantizedDetector.from_variables(jax.device_get(variables),
                                                 cfg, calib)

    k = cfg.DETECTION_MAX_INSTANCES
    kp = min(int(cfg.MASK_TOP_K or 0) or k, k)
    h, w = cfg.IMAGE_SHAPE[:2]
    pool = cfg.MASK_POOL_SIZE
    det_nms = float(cfg.DETECTION_NMS_THRESHOLD)

    def upto_decode(images):
        grid, fmap = det.trunk(images)
        d = decode_detections(grid, cfg.anchors_wh, cfg.GRID_H, cfg.GRID_W)
        boxes, scores = d[..., :4], d[..., 4]
        classes = d[..., 5].astype(jnp.int32)
        area_ok = ((boxes[..., 2] - boxes[..., 0])
                   * (boxes[..., 3] - boxes[..., 1])) > 0
        masked = jnp.where(area_ok, scores, -1.0)
        top_scores, idx = jax.lax.top_k(masked, k)
        top_boxes = jnp.take_along_axis(boxes, idx[..., None], axis=1)
        top_classes = jnp.take_along_axis(classes, idx, axis=1)
        valid = top_scores > cfg.OBJ_THRESHOLD
        keep = jax.vmap(lambda bx, cl, va: index_order_class_nms_mask(
            bx, cl, va, det_nms))(top_boxes, top_classes, valid)
        valid = valid & keep
        if kp < k:
            key_ = jnp.where(valid, top_scores + 2.0, top_scores)
            _, order = jax.lax.top_k(key_, k)
            top_boxes = jnp.take_along_axis(top_boxes, order[..., None], axis=1)
            top_scores = jnp.take_along_axis(top_scores, order, axis=1)
            top_classes = jnp.take_along_axis(top_classes, order, axis=1)
            valid = jnp.take_along_axis(valid, order, axis=1)
        return fmap, top_boxes, top_scores, top_classes, valid

    def stage_trunk(images):
        return det.trunk(images)

    def stage_decode(images):
        fmap, b_, s_, c_, v_ = upto_decode(images)
        return b_, s_, c_, v_

    def stage_crop(images):
        fmap, b_, s_, c_, v_ = upto_decode(images)
        x = crop_and_resize(fmap, b_[:, :kp], (pool, pool),
                            dtype=jnp.bfloat16)
        return x, s_, v_

    def stage_maskconvs(images):
        fmap, b_, s_, c_, v_ = upto_decode(images)
        x = crop_and_resize(fmap, b_[:, :kp], (pool, pool),
                            dtype=jnp.bfloat16)
        bsz = x.shape[0]
        x = x.astype(jnp.float32).reshape(bsz * kp, pool, pool, x.shape[-1])
        m = quant.run_layers(det.graph["mask"], x, quant=True)
        return m, s_, v_

    def stage_select(images):
        fmap, b_, s_, c_, v_ = upto_decode(images)
        m = det.mask_branch(b_[:, :kp], fmap)
        onehot = jax.nn.one_hot(c_[:, :kp], cfg.NUM_CLASSES, dtype=m.dtype)
        sel = jnp.einsum("bkhwc,bkc->bkhw", m, onehot)
        return sel, s_, v_

    def stage_full(images):
        return det.detect_fn()(images)

    stages = [("trunk", stage_trunk), ("+decode_nms", stage_decode),
              ("+crop", stage_crop), ("+maskconvs", stage_maskconvs),
              ("+select", stage_select), ("full", stage_full)]
    if args.stages:
        want = set(args.stages.split(","))
        stages = [s for s in stages if s[0] in want]

    def make_repeat(fn):
        @functools.partial(jax.jit, static_argnums=(1,))
        def repeat(images, n):
            def body(carry, _):
                img, acc = carry
                s = _checksum(fn(img))
                img = img + s * jnp.float32(1e-30)
                return (img, acc + s), None
            (_, acc), _ = jax.lax.scan(body, (images, jnp.float32(0)), None,
                                       length=n)
            return acc
        return repeat

    images = jnp.asarray(np.random.RandomState(0)
                         .rand(args.batch, *cfg.IMAGE_SHAPE)
                         .astype(np.float32))
    prev = 0.0
    for name, fn in stages:
        t = bench(make_repeat(fn), images)
        us = t / args.batch * 1e6
        print(json.dumps({"stage": name, "us_per_img": round(us, 2),
                          "delta_us": round(us - prev, 2)}), flush=True)
        prev = us


if __name__ == "__main__":
    main()
