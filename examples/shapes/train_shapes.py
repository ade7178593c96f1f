#!/usr/bin/env python
"""Train Mask-YOLO on the synthetic Shapes dataset.

Driver-script parity with the reference's example/shapes/train_shapes.py:
build the Shapes train/val datasets, construct MaskYOLO in training mode, and
train end-to-end (YOLO loss + mask loss).
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
    ap.add_argument("--train-images", type=int, default=500)
    ap.add_argument("--val-images", type=int, default=50)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--mode", choices=["training", "yolo"], default="training")
    ap.add_argument("--model-dir", default="./checkpoints/shapes")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--augment", action="store_true",
                    help="seeded flip/rot90/scale/brightness augmentation "
                         "(data/augment.default_augmenter)")
    args = ap.parse_args()

    config = ShapesConfig()
    config.display()

    dataset_train = ShapesDataset()
    dataset_train.load_shapes(args.train_images, config.IMAGE_SHAPE[0],
                              config.IMAGE_SHAPE[1], seed=args.seed)
    dataset_train.prepare()

    dataset_val = ShapesDataset()
    dataset_val.load_shapes(args.val_images, config.IMAGE_SHAPE[0],
                            config.IMAGE_SHAPE[1], seed=args.seed + 1)
    dataset_val.prepare()

    augmentation = None
    if args.augment:
        from mask_yolo_tpu.data.augment import default_augmenter
        augmentation = default_augmenter(seed=args.seed)

    model = MaskYOLO(mode=args.mode, config=config, model_dir=args.model_dir,
                     seed=args.seed)
    model.train(dataset_train, dataset_val,
                learning_rate=args.lr or config.LEARNING_RATE,
                epochs=args.epochs, layers="all", augmentation=augmentation)


if __name__ == "__main__":
    main()
