"""Batch prediction CLI: run the on-chip detect pipeline over image files and
emit COCO "results"-format JSON (plus optional overlay PNGs).

The reference's inference surface was per-image driver scripts that saved one
matplotlib overlay (example/shapes/infer_shapes.py, model.py:1238-1328); this
tool is the production equivalent: batched, optionally int8-quantized and/or
mesh-sharded, with machine-readable output any COCO scorer accepts
(data/coco.detections_to_coco_results). Images whose size differs from
Config.IMAGE_SHAPE are resized on host (utils.image.resize_image — the
reference's per-axis-stretch semantics, myolo_utils.py:369-390) and boxes and
masks in the output are mapped back to the original frames.

Examples:
  python tools/predict.py --weights ./quality_run/weights --config shapes \
      --images ./my_pngs --out results.json --overlays 4
  python tools/predict.py --weights W --config-json ./ckpt/config.json \
      --images a.png b.png --quantize --labels background,square,...
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".bmp")


def build_config(args):
    from mask_yolo_tpu.config import Config, CocoStyleConfig
    from mask_yolo_tpu.data.shapes import ShapesConfig

    if args.config_json:
        with open(args.config_json) as f:
            loaded = json.load(f)
        # config.json (written by train()) serializes every attribute;
        # real knobs are UPPERCASE, derived helpers are lowercase properties
        fields = {k: v for k, v in loaded.items() if k.isupper()}
        base = {"shapes": ShapesConfig, "coco": CocoStyleConfig,
                None: Config}.get(args.config, Config)
        cfg_cls = type("LoadedConfig", (base,), fields)
        return cfg_cls()
    base = {"shapes": ShapesConfig, "coco": CocoStyleConfig}[args.config]
    overrides = {}
    if args.labels:
        labels = args.labels.split(",")
        overrides["LABELS"] = labels
        overrides["NUM_CLASSES"] = len(labels)
    if overrides:
        return type("RunConfig", (base,), overrides)()
    return base()


def iter_image_paths(specs):
    for spec in specs:
        if os.path.isdir(spec):
            for name in sorted(os.listdir(spec)):
                if name.lower().endswith(IMAGE_EXTS):
                    yield os.path.join(spec, name)
        else:
            yield spec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", required=True)
    ap.add_argument("--images", nargs="+", required=True,
                    help="image files and/or directories")
    ap.add_argument("--config", choices=["shapes", "coco"], default=None)
    ap.add_argument("--config-json", default=None,
                    help="config.json written by train() next to checkpoints "
                         "(reconstructs the exact training config)")
    ap.add_argument("--labels", default=None,
                    help="comma-separated class names (background first)")
    ap.add_argument("--out", default="predictions.json")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--score-threshold", type=float, default=0.35)
    ap.add_argument("--quantize", action="store_true",
                    help="int8 path (PTQ calibrated on the first batch)")
    ap.add_argument("--qat-steps", type=int, default=0,
                    help="label-free QAT finetune steps after PTQ")
    ap.add_argument("--mesh", action="store_true",
                    help="shard each batch over the device mesh")
    ap.add_argument("--overlays", type=int, default=0,
                    help="save overlay PNGs for the first N images")
    ap.add_argument("--overlay-dir", default="./img_results")
    args = ap.parse_args()
    if not (args.config or args.config_json):
        ap.error("one of --config / --config-json is required")

    import numpy as np

    from mask_yolo_tpu import MaskYOLO
    from mask_yolo_tpu.data.coco import detections_to_coco_results
    from mask_yolo_tpu.utils.image import resize_image

    config = build_config(args)
    net_h, net_w = config.IMAGE_SHAPE[:2]

    paths = list(iter_image_paths(args.images))
    if not paths:
        raise SystemExit("no images found")

    from PIL import Image

    model = MaskYOLO(mode="inference", config=config)
    model.load_weights(args.weights)

    def load(path):
        img = np.asarray(Image.open(path).convert("RGB"))
        resized, scale = resize_image(img, (net_h, net_w))
        return img, resized.astype(np.float32) / 255.0, scale

    if args.quantize:
        calib = np.stack([load(p)[1] for p in paths[:args.batch_size]])
        model.quantize(calib, finetune_steps=args.qat_steps)

    results = []
    n_batches = (len(paths) + args.batch_size - 1) // args.batch_size
    for b in range(n_batches):
        chunk = paths[b * args.batch_size:(b + 1) * args.batch_size]
        loaded = [load(p) for p in chunk]
        batch = np.stack([l[1] for l in loaded])
        if len(chunk) < args.batch_size:  # pad: keep one compiled program
            batch = np.concatenate([batch, np.zeros(
                (args.batch_size - len(chunk), net_h, net_w, 3), np.float32)])
        out = model.detect_batch(batch, mesh=True if args.mesh else None)
        out = {k: np.asarray(v) for k, v in out.items()}
        for bi, (orig, _, scale) in enumerate(loaded):
            keep = out["valid"][bi] & (out["scores"][bi] >= args.score_threshold)
            idx = np.where(keep)[0]
            image_id = os.path.splitext(os.path.basename(chunk[bi]))[0]
            image_id = int(image_id) if image_id.isdigit() else image_id
            results.extend(detections_to_coco_results(
                image_id,
                out["boxes"][bi][idx],
                out["classes"][bi][idx],
                out["scores"][bi][idx],
                np.transpose(out["masks"][bi][idx], (1, 2, 0)),
                scale=scale))
            n_done = b * args.batch_size + bi
            if n_done < args.overlays:
                from mask_yolo_tpu.utils import visualize

                os.makedirs(args.overlay_dir, exist_ok=True)
                labels = (config.LABELS or
                          [str(i) for i in range(config.NUM_CLASSES)])
                resized_u8 = (batch[bi] * 255).astype(np.uint8)
                visualize.display_instances(
                    resized_u8, out["boxes"][bi][idx],
                    np.transpose(out["masks"][bi][idx], (1, 2, 0)),
                    out["classes"][bi][idx], labels, out["scores"][bi][idx],
                    save_path=os.path.join(
                        args.overlay_dir,
                        f"predict-{os.path.basename(chunk[bi])}.png"))
        print(f"batch {b + 1}/{n_batches} done", flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f)
    print(f"{len(results)} detections over {len(paths)} images -> {args.out}")


if __name__ == "__main__":
    main()
