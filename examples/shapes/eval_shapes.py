#!/usr/bin/env python
"""Quantitative evaluation on Shapes: box/mask AP50, COCO mAP, recall.

New capability vs the reference, which only ever eyeballed PNG overlays
(/root/reference/README.md:10-22) — this runs the batched on-chip detect
pipeline over a held-out Shapes set and prints real numbers.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))


import argparse
import json

from mask_yolo_tpu import MaskYOLO, evaluate_dataset
from mask_yolo_tpu.data.shapes import ShapesConfig, ShapesDataset


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", required=True, help="checkpoint directory")
    ap.add_argument("--num-images", type=int, default=50)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--seed", type=int, default=999)
    ap.add_argument("--score-threshold", type=float, default=0.35)
    args = ap.parse_args()

    config = ShapesConfig()
    dataset = ShapesDataset()
    dataset.load_shapes(args.num_images, config.IMAGE_SHAPE[0],
                        config.IMAGE_SHAPE[1], seed=args.seed)
    dataset.prepare()

    model = MaskYOLO(mode="inference", config=config)
    model.load_weights(args.weights)
    result = evaluate_dataset(model, dataset, config,
                              batch_size=args.batch_size,
                              score_threshold=args.score_threshold,
                              verbose=True)
    result.pop("per_image")
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
