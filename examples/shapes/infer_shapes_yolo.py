#!/usr/bin/env python
"""Detection-only (YOLO branch) inference on Shapes images.

Parity with the reference's example/shapes/infer_shapes_yolo_model.py:
run the yolo-mode model and draw the decoded + NMS'd boxes.
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

    model = MaskYOLO(mode="yolo", config=config)
    model.load_weights(args.weights)
    for image_id in dataset.image_ids:
        image = dataset.load_image(image_id)
        boxes = model.infer_yolo(image, save_path=args.save_path)
        print(f"image {image_id}: {len(boxes)} boxes")
        for b in boxes:
            print(f"  {config.LABELS[b['label']]} {b['score']:.3f} "
                  f"({b['xmin']:.2f},{b['ymin']:.2f})-({b['xmax']:.2f},{b['ymax']:.2f})")


if __name__ == "__main__":
    main()
