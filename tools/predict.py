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

    base = {"shapes": ShapesConfig, "coco": CocoStyleConfig,
            None: Config}[args.config]
    fields = {}
    if args.config_json:
        with open(args.config_json) as f:
            loaded = json.load(f)
        # config.json (written by train()) serializes every attribute;
        # real knobs are UPPERCASE, derived helpers are lowercase properties
        fields.update({k: v for k, v in loaded.items() if k.isupper()})
    if args.labels:  # applies on top of --config-json too
        labels = args.labels.split(",")
        fields["LABELS"] = labels
        fields["NUM_CLASSES"] = len(labels)
    if fields:
        return type("RunConfig", (base,), fields)()
    return base()


def iter_image_paths(specs):
    for spec in specs:
        if os.path.isdir(spec):
            for name in sorted(os.listdir(spec)):
                if name.lower().endswith(IMAGE_EXTS):
                    yield os.path.join(spec, name)
        else:
            yield spec


def assign_image_ids(paths):
    """COCO image_id per path: the numeric filename stem when stems are
    globally unambiguous (so results line up with annotation files that use
    numeric ids), else the path itself — '7.png' vs '007.png' or the same
    stem in two input directories must not merge into one id."""
    ids = []
    for p in paths:
        stem = os.path.splitext(os.path.basename(p))[0]
        ids.append(int(stem) if stem.isdigit() else stem)
    return ids if len(set(ids)) == len(ids) else list(paths)


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
    ap.add_argument("--coco-categories", default=None,
                    help="COCO annotation JSON whose categories define the "
                         "category_id mapping — REQUIRED for scoring against "
                         "real COCO annotations (non-contiguous ids); "
                         "omit for datasets written by dataset_to_coco_json")
    args = ap.parse_args()
    if not (args.config or args.config_json):
        ap.error("one of --config / --config-json is required")

    import numpy as np

    from mask_yolo_tpu import MaskYOLO
    from mask_yolo_tpu.data.coco import (coco_category_map,
                                         detections_to_coco_results)
    from mask_yolo_tpu.utils.image import resize_image

    config = build_config(args)
    net_h, net_w = config.IMAGE_SHAPE[:2]
    category_map = (coco_category_map(args.coco_categories)
                    if args.coco_categories else None)

    paths = list(iter_image_paths(args.images))
    if not paths:
        raise SystemExit("no images found")
    image_ids = assign_image_ids(paths)

    from PIL import Image

    model = MaskYOLO(mode="inference", config=config)
    model.load_weights(args.weights)

    def load(path):
        img = np.asarray(Image.open(path).convert("RGB"))
        resized, scale = resize_image(img, (net_h, net_w))
        return img, resized.astype(np.float32) / 255.0, scale

    results = []
    n_batches = (len(paths) + args.batch_size - 1) // args.batch_size
    for b in range(n_batches):
        chunk = paths[b * args.batch_size:(b + 1) * args.batch_size]
        loaded = [load(p) for p in chunk]
        if b == 0 and args.quantize:  # calibrate on the already-loaded batch
            model.quantize(np.stack([l[1] for l in loaded]),
                           finetune_steps=args.qat_steps)
        batch = np.stack([l[1] for l in loaded])
        if len(chunk) < args.batch_size:  # pad: keep one compiled program
            batch = np.concatenate([batch, np.zeros(
                (args.batch_size - len(chunk), net_h, net_w, 3), np.float32)])
        out = model.detect_batch(batch, mesh=True if args.mesh else None)
        out = {k: np.asarray(v) for k, v in out.items()}
        for bi, (orig, _, scale) in enumerate(loaded):
            keep = out["valid"][bi] & (out["scores"][bi] >= args.score_threshold)
            idx = np.where(keep)[0]
            results.extend(detections_to_coco_results(
                image_ids[b * args.batch_size + bi],
                out["boxes"][bi][idx],
                out["classes"][bi][idx],
                out["scores"][bi][idx],
                np.transpose(out["masks"][bi][idx], (1, 2, 0)),
                scale=scale, category_map=category_map))
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
                        "predict-" + os.path.splitext(
                            os.path.basename(chunk[bi]))[0] + ".png"))
        print(f"batch {b + 1}/{n_batches} done", flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f)
    print(f"{len(results)} detections over {len(paths)} images -> {args.out}")


if __name__ == "__main__":
    main()
