#!/usr/bin/env python
"""Visual sanity check of the Rice data pipeline (parity with the reference's
example/rice/test_tice_generator.py): load VIA annotations, pull one batch
through the generator, and display GT boxes + masks."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))


import argparse

import numpy as np

from mask_yolo_tpu.data.pipeline import BatchGenerator, preload_dataset
from mask_yolo_tpu.data.via import RiceConfig, RiceDataset
from mask_yolo_tpu.utils import visualize


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True, help="rice dataset root")
    ap.add_argument("--subset", default="train")
    ap.add_argument("--save-path", default="./rice_generator_check.png")
    args = ap.parse_args()

    config = RiceConfig()
    ds = RiceDataset()
    ds.load_rice(args.dataset, args.subset)
    ds.prepare()

    data = preload_dataset(ds, config)
    gen = BatchGenerator(data, config, mode="training", shuffle=False)
    batch = gen[0]

    image = (batch["image"][0] * 255).astype(np.uint8)
    ids = batch["gt_class_ids"][0]
    keep = ids > 0
    visualize.display_instances(
        image, batch["gt_boxes"][0][keep],
        np.transpose(batch["gt_masks"][0], (0, 1, 2))[:, :, keep],
        ids[keep], config.LABELS, save_path=args.save_path)
    print(f"wrote {args.save_path}: {int(keep.sum())} GT instances")


if __name__ == "__main__":
    main()
