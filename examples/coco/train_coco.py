#!/usr/bin/env python
"""Train / eval / infer Mask-YOLO on a COCO-JSON instance-segmentation
dataset (the BASELINE scale-out operating point, CocoStyleConfig). The
reference has no COCO path at all — its loaders are VIA-only
(/root/reference/example/rice/rice_dataset.py:104-159).

Layout expected:
    --train-ann path/to/instances_train.json  --train-images path/to/images
    --val-ann   path/to/instances_val.json    --val-images   path/to/images
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import argparse

from mask_yolo_tpu import MaskYOLO
from mask_yolo_tpu.config import CocoStyleConfig
from mask_yolo_tpu.data.coco import CocoDataset


def load(ann, image_dir, class_ids=None):
    d = CocoDataset()
    d.load_coco(ann, image_dir, class_ids=class_ids)
    d.prepare()
    return d


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--command", choices=["train", "eval", "infer"],
                    default="train")
    ap.add_argument("--train-ann")
    ap.add_argument("--train-images")
    ap.add_argument("--val-ann", required=True)
    ap.add_argument("--val-images", required=True)
    ap.add_argument("--weights", default=None)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--model-dir", default="./checkpoints/coco")
    ap.add_argument("--class-ids", default=None,
                    help="comma-separated COCO category ids to restrict to")
    ap.add_argument("--score-threshold", type=float, default=0.35)
    args = ap.parse_args()

    class_ids = ([int(c) for c in args.class_ids.split(",")]
                 if args.class_ids else None)
    val_ds = load(args.val_ann, args.val_images, class_ids)

    class RunConfig(CocoStyleConfig):
        BATCH_SIZE = args.batch_size
        NUM_CLASSES = val_ds.num_classes
        LABELS = list(val_ds.class_names)

    config = RunConfig()
    config.display()

    if args.command == "train":
        assert args.train_ann and args.train_images
        train_ds = load(args.train_ann, args.train_images, class_ids)
        model = MaskYOLO(mode="training", config=config,
                         model_dir=args.model_dir,
                         yolo_pretrain_dir=args.weights)
        model.train(train_ds, val_ds, learning_rate=config.LEARNING_RATE,
                    epochs=args.epochs, layers="all")
    elif args.command == "eval":
        from mask_yolo_tpu import evaluate_dataset

        model = MaskYOLO(mode="inference", config=config)
        model.load_weights(args.weights)
        result = evaluate_dataset(model, val_ds, config, batch_size=8,
                                  score_threshold=args.score_threshold)
        result.pop("per_image", None)
        import json
        print(json.dumps(result, indent=2))
    else:
        model = MaskYOLO(mode="inference", config=config)
        model.load_weights(args.weights)
        for image_id in list(val_ds.image_ids)[:8]:
            from mask_yolo_tpu.data.loader import load_image_gt

            image, _, _, _ = load_image_gt(val_ds, config, image_id)
            model.detect(image, cs_threshold=args.score_threshold)


if __name__ == "__main__":
    main()
