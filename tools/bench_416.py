"""A/B bench at the 416²/80-class operating point (CocoStyleConfig):
XLA int8 baseline vs (a) the fused DW+PW Pallas trunk blocks
(ops/pallas_ds.py, --fused-ds) and (b) the K-blocked fused Pallas mask
branch (ops/pallas_mask.py, --pallas-mask), using the same delta-timing
harness as bench.py (see its docstring for the methodology through this
runner's RPC tunnel).

Run: python tools/bench_416.py [--batch 128] [--paths int8,fused_ds,pallas_mask]
Prints one JSON line per path.
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


def make_repeat(det, fused_ds: bool, fused_mask_kernel):
    from mask_yolo_tpu import pipelines

    cfg = det.config
    if (fused_mask_kernel is None
            and getattr(cfg, "QUANT_FOLD_MASK_SELECT", False)
            and det.graph["mask"][-1].kind == "out_d2s"):
        # mirror QuantizedDetector.detect_fn's wiring (same getattr default
        # as quant.py — the fold is a measured-NEGATIVE knob, default off)
        def fused_mask_kernel(rois, fmap, classes):
            return det.mask_branch(rois, fmap, classes=classes)

    def trunk(images):
        return det.trunk(images, fused_ds=fused_ds)

    @functools.partial(jax.jit, static_argnums=(1,))
    def repeat(images, n):
        def body(carry, _):
            img, acc = carry
            out = pipelines.detect_from_callables(
                trunk, det.mask_branch, img, cfg,
                fused_mask=fused_mask_kernel)
            s = _checksum(out)
            img = img + s * jnp.float32(1e-30)
            return (img, acc + s), None
        (_, acc), _ = jax.lax.scan(body, (images, jnp.float32(0)), None,
                                   length=n)
        return acc

    return repeat


def bench(call, cfg, batch_size, n1=2, n2=8, reps=3):
    images = jax.device_put(jnp.asarray(
        np.random.RandomState(0).rand(batch_size, *cfg.IMAGE_SHAPE)
        .astype(np.float32)))
    float(call(images, n1))
    float(call(images, n2))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(call(images, n1))
        t1 = time.perf_counter()
        float(call(images, n2))
        t2 = time.perf_counter()
        dt = (t2 - t1) - (t1 - t0)
        if dt > 0:
            best = min(best, dt / (n2 - n1))
    if not np.isfinite(best):
        raise RuntimeError("non-positive deltas")
    return batch_size / best


def main():
    from mask_yolo_tpu.utils.compile_cache import enable as _enable_cache
    _enable_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--paths", default="int8,fused_ds,pallas_mask")
    ap.add_argument("--k-block", type=int, default=16)
    ap.add_argument("--backbone", default=None,
                    choices=["mobilenet", "resnet50_fpn"],
                    help="override CocoStyleConfig.BACKBONE (resnet50_fpn = "
                         "hybrid int8: int8 trunk convs, f32 FPN lateral sums)")
    ap.add_argument("--set", nargs="*", default=[], metavar="KEY=VAL",
                    help="Config attribute overrides, VAL a Python literal "
                         "(e.g. --set QUANT_FAST_CROP=False) — the A/B knob "
                         "for pricing individual quant-path optimizations")
    args = ap.parse_args()

    from mask_yolo_tpu.config import CocoStyleConfig
    from mask_yolo_tpu.models.network import MaskYoloNet
    from mask_yolo_tpu.quant import QuantizedDetector

    cfg = CocoStyleConfig()
    if args.backbone:
        cfg.BACKBONE = args.backbone
    import ast
    overrides = {}
    for kv in args.set:
        k, v = kv.split("=", 1)
        overrides[k] = ast.literal_eval(v)
        setattr(cfg, k, overrides[k])
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
    det = QuantizedDetector.from_variables(jax.device_get(variables), cfg,
                                           calib)

    fused_mask = None

    def make_fused_mask():
        from mask_yolo_tpu.ops.pallas_mask import (fused_mask_branch,
                                                   pack_mask_weights)
        weights = pack_mask_weights(det.graph, cfg.NUM_CLASSES)

        def fm(rois, fmap, classes):
            return fused_mask_branch(fmap, rois, classes, weights,
                                     pool=cfg.MASK_POOL_SIZE,
                                     num_classes=cfg.NUM_CLASSES,
                                     k_block=args.k_block)
        return fm

    def make_infer_yolo(int8: bool = False):
        """Detection-only inference (infer_yolo): trunk + decode + blocked
        per-class NMS over 13·13·5 = 845 boxes × 81 classes — the path that
        used to run an 845-trip sequential fori_loop per class.

        int8=True routes the trunk through the quantized graph (the path
        MaskYOLO.quantize() rewires infer_yolo to, r4)."""
        from mask_yolo_tpu import pipelines

        @functools.partial(jax.jit, static_argnums=(1,))
        def repeat(images, n):
            def body(carry, _):
                img, acc = carry
                if int8:
                    out = pipelines.infer_yolo_from_callables(
                        det.trunk, img, cfg)
                else:
                    out = pipelines.infer_yolo_outputs(net, variables, img,
                                                       cfg)
                s = _checksum(out)
                img = img + s * jnp.float32(1e-30)
                return (img, acc + s), None
            (_, acc), _ = jax.lax.scan(body, (images, jnp.float32(0)), None,
                                       length=n)
            return acc
        return repeat

    for path in args.paths.split(","):
        path = path.strip()
        if path in ("infer_yolo", "infer_yolo_int8"):
            call = make_infer_yolo(int8=path.endswith("int8"))
            try:
                ips = bench(call, cfg, args.batch)
                print(json.dumps({"path": path, "img_per_s": round(ips, 1),
                                  "batch": args.batch,
                                  "backbone": cfg.BACKBONE,
                                  **overrides}), flush=True)
            except Exception as e:
                print(json.dumps({"path": path,
                                  "error": f"{type(e).__name__}: {e}"}),
                      flush=True)
            continue
        if path == "int8":
            call = make_repeat(det, fused_ds=False, fused_mask_kernel=None)
        elif path == "fused_ds":
            call = make_repeat(det, fused_ds=True, fused_mask_kernel=None)
        elif path == "pallas_mask":
            call = make_repeat(det, fused_ds=False,
                               fused_mask_kernel=make_fused_mask())
        elif path == "fused_both":
            call = make_repeat(det, fused_ds=True,
                               fused_mask_kernel=make_fused_mask())
        else:
            print(f"# unknown path {path}", file=sys.stderr)
            continue
        try:
            ips = bench(call, cfg, args.batch)
            print(json.dumps({"path": path, "img_per_s": round(ips, 1),
                              "batch": args.batch,
                              "backbone": cfg.BACKBONE,
                              **overrides}), flush=True)
        except Exception as e:
            print(json.dumps({"path": path,
                              "error": f"{type(e).__name__}: {e}"}),
                  flush=True)


if __name__ == "__main__":
    main()
