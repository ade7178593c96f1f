#!/usr/bin/env python
"""Train / infer Mask-YOLO on the VIA-annotated Food dataset (parity with the
reference's example/food/train_food.py, argparse-ified instead of
edit-the-script)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))


import argparse

from mask_yolo_tpu import MaskYOLO
from mask_yolo_tpu.data.via import FoodConfig, ViaDataset


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True, help="food dataset root")
    ap.add_argument("--command", choices=["train", "infer"], default="train")
    ap.add_argument("--weights", default=None)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--model-dir", default="./checkpoints/food")
    args = ap.parse_args()

    config = FoodConfig()
    config.display()

    if args.command == "train":
        dataset_train = ViaDataset(source="food", class_name="food")
        dataset_train.load_via(args.dataset, "train")
        dataset_train.prepare()
        dataset_val = ViaDataset(source="food", class_name="food")
        dataset_val.load_via(args.dataset, "val")
        dataset_val.prepare()

        model = MaskYOLO(mode="training", config=config,
                         model_dir=args.model_dir,
                         yolo_pretrain_dir=args.weights)
        model.train(dataset_train, dataset_val,
                    learning_rate=config.LEARNING_RATE,
                    epochs=args.epochs, layers="all")
    else:
        dataset_val = ViaDataset(source="food", class_name="food")
        dataset_val.load_via(args.dataset, "val")
        dataset_val.prepare()
        model = MaskYOLO(mode="inference", config=config)
        model.load_weights(args.weights)
        for image_id in dataset_val.image_ids:
            from mask_yolo_tpu.data.loader import load_image_gt

            image, _, _, _ = load_image_gt(dataset_val, config, image_id)
            model.detect(image)


if __name__ == "__main__":
    main()
