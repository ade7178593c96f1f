#!/usr/bin/env python
"""Run the full detection+mask pipeline on Shapes images.

Parity with the reference's example/shapes/infer_shapes.py — with its bug
fixed: the reference calls a nonexistent `detect_for_one`
(/root/reference/example/shapes/infer_shapes.py:52); the real method is
`detect`, used here.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))


import argparse

from mask_yolo_tpu import MaskYOLO
from mask_yolo_tpu.data.shapes import ShapesConfig, ShapesDataset


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", required=True, help="checkpoint directory")
    ap.add_argument("--num-images", type=int, default=4)
    ap.add_argument("--save-path", default="./img_results/")
    ap.add_argument("--seed", type=int, default=123)
    args = ap.parse_args()

    config = ShapesConfig()
    config.BATCH_SIZE = 1

    dataset = ShapesDataset()
    dataset.load_shapes(args.num_images, config.IMAGE_SHAPE[0],
                        config.IMAGE_SHAPE[1], seed=args.seed)
    dataset.prepare()

    model = MaskYOLO(mode="inference", config=config)
    model.load_weights(args.weights)
    for image_id in dataset.image_ids:
        image = dataset.load_image(image_id)
        results = model.detect(image, save_path=args.save_path)
        r = results[0]
        print(f"image {image_id}: {len(r['class_ids'])} detections, "
              f"classes={r['class_ids'].tolist()}, "
              f"scores={[round(float(s), 3) for s in r['confidence_scores']]}")


if __name__ == "__main__":
    main()
