"""Benchmark: end-to-end on-chip inference throughput at 224².

Measures the full image→boxes+masks pipeline (backbone → YOLO head → decode
→ NMS → top-K → ROIAlign → mask head → on-chip mask paste) in bfloat16 on
the attached TPU chip and prints ONE JSON line:

  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": r}

Baseline: the reference publishes no numbers (BASELINE.md); the target set by
BASELINE.json is ≥5,000 images/sec/chip, so vs_baseline = value / 5000.

Methodology (validated against a known-FLOPs matmul on this runner): the TPU
here sits behind an RPC tunnel where `block_until_ready` returns immediately
and every host↔device round-trip costs ~30 ms, so naive wall-clock timing
measures dispatch, not compute. Instead each timed unit is ONE jitted program
that runs the detect pipeline N times under `lax.scan`, chained by a tiny
data dependence (so XLA cannot CSE the iterations away), returning a scalar
checksum whose fetch forces completion. Per-iteration time is the *delta*
between an N2-iteration and an N1-iteration run, cancelling the fixed RPC
overhead. The same harness measured 167 TFLOP/s bf16 on an 8k matmul chain
(v5e peak ≈197), confirming the deltas are real device time.
"""

from __future__ import annotations

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

TARGET = 5000.0


def _setup(backbone: str | None = None):
    from mask_yolo_tpu.data.shapes import ShapesConfig
    from mask_yolo_tpu.models.network import MaskYoloNet

    class BenchConfig(ShapesConfig):
        COMPUTE_DTYPE = "bfloat16"

    if backbone:
        BenchConfig.BACKBONE = backbone
    cfg = BenchConfig()
    net = MaskYoloNet(num_classes=cfg.NUM_CLASSES, n_box=cfg.N_BOX,
                      top_feature_map_depth=cfg.TOP_FEATURE_MAP_DEPTH,
                      mask_pool_size=cfg.MASK_POOL_SIZE, backbone=cfg.BACKBONE,
                      compute_dtype=cfg.COMPUTE_DTYPE,
                      image_hw=tuple(cfg.IMAGE_SHAPE[:2]))
    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((1, *cfg.IMAGE_SHAPE), jnp.float32)
    variables = jax.jit(lambda r, i, ro: net.init(r, i, ro, train=False))(
        rng, img, jnp.zeros((1, 8, 4), jnp.float32))
    return cfg, net, variables


def _checksum(out):
    """Small scalar summarizing every output (forces full pipeline)."""
    s = jnp.float32(0)
    for v in jax.tree_util.tree_leaves(out):
        s = s + jnp.sum(v.astype(jnp.float32)) * jnp.float32(1e-6)
    return s


def make_repeat_fn(net, cfg):
    from mask_yolo_tpu import pipelines

    @functools.partial(jax.jit, static_argnums=(2,))
    def repeat(variables, images, n):
        def body(carry, _):
            img, acc = carry
            # nested jit is inlined into the enclosing trace
            out = pipelines.detect_outputs(net, variables, img, cfg)
            s = _checksum(out)
            # data dependence: perturb input by an invisible epsilon so the
            # scan body cannot be hoisted/CSE'd; value is numerically zero
            img = img + s * jnp.float32(1e-30)
            return (img, acc + s), None
        (_, acc), _ = jax.lax.scan(body, (images, jnp.float32(0)), None,
                                   length=n)
        return acc

    return repeat


def make_repeat_fn_int8(det, fused: bool = False):
    """Same harness over the int8 quantized detect pipeline (quant.py).
    fused=True runs the mask branch as the fused per-ROI Pallas kernel."""
    from mask_yolo_tpu import pipelines

    cfg = det.config
    fused_mask = None
    if fused:
        from mask_yolo_tpu.ops.pallas_mask import (fused_mask_branch,
                                                   pack_mask_weights)

        weights = pack_mask_weights(det.graph, cfg.NUM_CLASSES)

        def fused_mask(rois, fmap, classes):
            return fused_mask_branch(fmap, rois, classes, weights,
                                     pool=cfg.MASK_POOL_SIZE,
                                     num_classes=cfg.NUM_CLASSES)

    @functools.partial(jax.jit, static_argnums=(1,))
    def repeat(images, n):
        def body(carry, _):
            img, acc = carry
            out = pipelines.detect_from_callables(det.trunk, det.mask_branch,
                                                  img, cfg,
                                                  fused_mask=fused_mask)
            s = _checksum(out)
            img = img + s * jnp.float32(1e-30)
            return (img, acc + s), None
        (_, acc), _ = jax.lax.scan(body, (images, jnp.float32(0)), None,
                                   length=n)
        return acc

    return repeat


def bench_detect(call, cfg, batch_size: int,
                 n1: int = 2, n2: int = 52, reps: int = 5):
    """call(images, n) -> scalar; returns images/sec via delta timing.

    n2 - n1 sets the measured chain length. It must be large enough that the
    device-time delta dwarfs the RPC round-trip jitter (~±10 ms on this
    tunnel): at 10 iterations the delta is only ~2-4x the jitter and
    run-to-run spread reached ±10% (r3 observed 15.5k vs 19.1k img/s from
    the same binary). 50 iterations puts the delta at ~0.3-0.7 s and the
    spread back under ±2%. The median (not min) of the per-rep deltas is
    reported: with delta timing, min systematically picks the most
    noise-deflated sample.
    """
    images = jax.device_put(
        jnp.asarray(np.random.RandomState(0)
                    .rand(batch_size, *cfg.IMAGE_SHAPE).astype(np.float32)))
    float(call(images, n1))  # compile + warm
    float(call(images, n2))
    deltas = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(call(images, n1))
        t1 = time.perf_counter()
        float(call(images, n2))
        t2 = time.perf_counter()
        dt = (t2 - t1) - (t1 - t0)
        if dt > 0:
            deltas.append(dt / (n2 - n1))
    if not deltas:
        raise RuntimeError("timing deltas were non-positive")
    return batch_size / float(np.median(deltas))


def main():
    import argparse

    from mask_yolo_tpu.utils.compile_cache import enable as _enable_cache
    _enable_cache()

    from mask_yolo_tpu.quant import QuantizedDetector

    ap = argparse.ArgumentParser()
    # default None keeps the driver-run flagship point unchanged
    ap.add_argument("--backbone", default=None,
                    choices=["mobilenet", "resnet50_fpn"])
    args = ap.parse_args()

    cfg, net, variables = _setup(args.backbone)
    repeat_bf16 = make_repeat_fn(net, cfg)
    calib = np.random.RandomState(1).rand(8, *cfg.IMAGE_SHAPE).astype(np.float32)
    det = QuantizedDetector.from_variables(jax.device_get(variables), cfg,
                                           calib, net=net)
    repeat_int8 = make_repeat_fn_int8(det)

    # the fused Pallas mask kernel (make_repeat_fn_int8(det, fused=True))
    # measured slower than the XLA int8 conv path at this operating point
    # (see ops/pallas_mask.py) — not benched by default
    paths = {
        "bf16": lambda im, n: repeat_bf16(variables, im, n),
        "int8": repeat_int8,
    }
    best = 0.0
    best_bs, best_path = 0, ""
    per_path = {}
    # batch 128 measured faster than 256 on both paths; one batch size keeps
    # the whole bench inside this runner's slow compile window
    for path, call in paths.items():
        for bs in (128,):
            try:
                ips = bench_detect(call, cfg, bs)
            except Exception as e:  # OOM at large batch etc.
                print(f"# {path} batch {bs} failed: {type(e).__name__}: {e}",
                      file=sys.stderr, flush=True)
                continue
            print(f"# {path} batch {bs}: {ips:,.0f} img/s", file=sys.stderr,
                  flush=True)
            per_path[path] = max(per_path.get(path, 0.0), ips)
            if ips > best:
                best, best_bs, best_path = ips, bs, path
    result = {
        "metric": "images/sec/chip end-to-end detect (224², boxes+masks on-chip)",
        "value": round(best, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(best / TARGET, 3),
        "batch_size": best_bs,
        "path": best_path,
        "per_path": {k: round(v, 1) for k, v in per_path.items()},
        "device": str(jax.devices()[0]),
    }
    if args.backbone:
        result["backbone"] = args.backbone
    print(json.dumps(result))


if __name__ == "__main__":
    main()
