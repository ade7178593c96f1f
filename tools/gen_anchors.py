#!/usr/bin/env python
"""Anchor k-means CLI.

Replaces the reference's 03_anchor_generator.ipynb workflow: read GT boxes
(from a boxes txt dump like the reference's rice_boxes.txt, or directly from
a dataset), run IoU k-means, write anchors_<k>.txt and an avg-IoU elbow plot.

Usage:
    python tools/gen_anchors.py --boxes boxes.txt --k 5 --grid 7 --out anchors_5.txt
    python tools/gen_anchors.py --dataset shapes --k 3 --sweep
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_boxes_txt(path, image_shape=(224, 224)):
    """Parse a boxes dump: one 'x1,y1,x2,y2' (or whitespace) box per line,
    pixel coordinates (the format of the reference's rice_boxes.txt)."""
    from mask_yolo_tpu.utils.anchors import boxes_to_wh

    rows = []
    with open(path) as f:
        for line in f:
            parts = line.replace(",", " ").split()
            if len(parts) >= 4:
                rows.append([float(x) for x in parts[:4]])
    return boxes_to_wh(np.asarray(rows), image_shape)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--boxes", help="txt file of GT boxes (x1 y1 x2 y2 px)")
    ap.add_argument("--dataset", choices=["shapes"],
                    help="generate boxes from a built-in dataset")
    ap.add_argument("--via-dir", help="VIA dataset root (train/ subdir used)")
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--grid", type=int, default=7)
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--out", default=None)
    ap.add_argument("--sweep", action="store_true",
                    help="also sweep k=1..10 and save avg_iou.png")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from mask_yolo_tpu.utils.anchors import (anchors_from_dataset, gen_anchors,
                                             sweep_k)

    if args.boxes:
        wh = load_boxes_txt(args.boxes, (args.image_size, args.image_size))
        anchors, avg = gen_anchors(wh, args.k, grid=args.grid, seed=args.seed)
    elif args.dataset == "shapes":
        from mask_yolo_tpu.data.shapes import ShapesConfig, ShapesDataset

        cfg = ShapesConfig()
        ds = ShapesDataset()
        ds.load_shapes(200, cfg.IMAGE_SHAPE[0], cfg.IMAGE_SHAPE[1], seed=args.seed)
        ds.prepare()
        anchors, avg = anchors_from_dataset(ds, cfg, k=args.k, seed=args.seed)
        wh = None
    elif args.via_dir:
        from mask_yolo_tpu.data.via import ViaConfig, ViaDataset

        cfg = ViaConfig()
        ds = ViaDataset()
        ds.load_via(args.via_dir, "train")
        ds.prepare()
        anchors, avg = anchors_from_dataset(ds, cfg, k=args.k, seed=args.seed)
        wh = None
    else:
        ap.error("one of --boxes / --dataset / --via-dir required")

    flat = ", ".join(f"{v:.5f}" for v in anchors.reshape(-1))
    print(f"k={args.k} avgIoU={avg:.4f}")
    print(f"ANCHORS = [{flat}]")
    out = args.out or f"anchors_{args.k}.txt"
    with open(out, "w") as f:
        f.write(flat + "\n")
    print(f"wrote {out}")

    if args.sweep and wh is not None:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        ks, ious = sweep_k(wh, 10, seed=args.seed)
        plt.plot(ks, ious, marker="o")
        plt.xlabel("k (number of anchors)")
        plt.ylabel("avg IoU")
        plt.savefig("avg_iou.png", bbox_inches="tight")
        print("wrote avg_iou.png")


if __name__ == "__main__":
    main()
