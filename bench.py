"""Benchmark: end-to-end on-chip inference throughput at 224².

Measures the full image→boxes+masks pipeline (backbone → YOLO head → decode
→ NMS → top-K → ROIAlign → mask head → on-chip mask paste) in bfloat16 on
the attached TPU chip and prints ONE JSON line:

  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": r}

Baseline: the reference publishes no numbers (BASELINE.md); the target set by
BASELINE.json is ≥5,000 images/sec/chip, so vs_baseline = value / 5000.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

TARGET = 5000.0


def _setup():
    from mask_yolo_tpu.data.shapes import ShapesConfig
    from mask_yolo_tpu.models.network import MaskYoloNet

    class BenchConfig(ShapesConfig):
        COMPUTE_DTYPE = "bfloat16"

    cfg = BenchConfig()
    net = MaskYoloNet(num_classes=cfg.NUM_CLASSES, n_box=cfg.N_BOX,
                      top_feature_map_depth=cfg.TOP_FEATURE_MAP_DEPTH,
                      mask_pool_size=cfg.MASK_POOL_SIZE, backbone=cfg.BACKBONE,
                      compute_dtype=cfg.COMPUTE_DTYPE)
    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((1, *cfg.IMAGE_SHAPE), jnp.float32)
    variables = jax.jit(lambda r, i, ro: net.init(r, i, ro, train=False))(
        rng, img, jnp.zeros((1, 8, 4), jnp.float32))
    return cfg, net, variables


def bench_detect(cfg, net, variables, batch_size: int, warmup: int = 3,
                 iters: int = 10):
    from mask_yolo_tpu import pipelines

    fn = jax.jit(lambda v, im: pipelines.detect_outputs(net, v, im, cfg))
    images = jax.device_put(
        jnp.asarray(np.random.RandomState(0)
                    .rand(batch_size, *cfg.IMAGE_SHAPE).astype(np.float32)))

    out = fn(variables, images)
    jax.block_until_ready(out)
    for _ in range(warmup):
        jax.block_until_ready(fn(variables, images))

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(variables, images)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return batch_size * iters / dt


def main():
    cfg, net, variables = _setup()
    best = 0.0
    best_bs = 0
    for bs in (64, 128, 256, 512):
        try:
            ips = bench_detect(cfg, net, variables, bs)
        except Exception as e:  # OOM at large batch etc.
            print(f"# batch {bs} failed: {type(e).__name__}", flush=True)
            continue
        print(f"# batch {bs}: {ips:,.0f} img/s", flush=True)
        if ips > best:
            best, best_bs = ips, bs
    result = {
        "metric": "images/sec/chip end-to-end detect (224², boxes+masks on-chip)",
        "value": round(best, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(best / TARGET, 3),
        "batch_size": best_bs,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
