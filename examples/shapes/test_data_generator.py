#!/usr/bin/env python
"""Generator sanity visualization (parity with the reference's
example/shapes/test_data_generator.py): build Shapes data through
load_image_gt + BatchGenerator, pull one batch, render it with GT overlays."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))


import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from mask_yolo_tpu.data.pipeline import BatchGenerator, preload_dataset
from mask_yolo_tpu.data.shapes import ShapesConfig, ShapesDataset


def main():
    config = ShapesConfig()
    config.BATCH_SIZE = 4
    ds = ShapesDataset()
    ds.load_shapes(16, config.IMAGE_SHAPE[0], config.IMAGE_SHAPE[1], seed=0)
    ds.prepare()

    data = preload_dataset(ds, config)
    gen = BatchGenerator(data, config, mode="training", shuffle=True, seed=0)
    batch = gen[0]
    print("batch keys:", {k: v.shape for k, v in batch.items()})
    print("grid conf per image:",
          batch["yolo_target"][..., 4].sum(axis=(1, 2, 3)))

    fig, axes = plt.subplots(1, 4, figsize=(16, 4))
    for i, ax in enumerate(axes):
        ax.imshow(batch["image"][i])
        for box in batch["gt_boxes"][i]:
            if np.abs(box).sum() > 0:
                x1, y1, x2, y2 = box
                ax.add_patch(plt.Rectangle((x1, y1), x2 - x1, y2 - y1,
                                           fill=False, edgecolor="red", lw=2))
        ax.axis("off")
    plt.savefig("generator_sanity.png", bbox_inches="tight")
    print("wrote generator_sanity.png")


if __name__ == "__main__":
    main()
