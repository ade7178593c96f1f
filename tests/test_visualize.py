"""Visualization smoke tests (matplotlib Agg backend)."""

import matplotlib

matplotlib.use("Agg")

import numpy as np

from mask_yolo_tpu.utils import visualize


def test_display_instances_smoke(tmp_path, rng):
    image = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    boxes = np.array([[5, 5, 30, 30], [20, 20, 50, 55]], dtype=np.float32)
    masks = np.zeros((64, 64, 2), dtype=bool)
    masks[8:28, 8:28, 0] = True
    masks[25:50, 25:45, 1] = True
    out = tmp_path / "inst.png"
    visualize.display_instances(image, boxes, masks, np.array([1, 2]),
                                ["bg", "a", "b"], np.array([0.9, 0.8]),
                                save_path=str(out))
    assert out.exists() and out.stat().st_size > 0


def test_draw_boxes_smoke(tmp_path, rng):
    image = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    boxes = [{"xmin": 0.1, "ymin": 0.1, "xmax": 0.5, "ymax": 0.5,
              "score": 0.7, "label": 1}]
    out = tmp_path / "boxes.png"
    visualize.draw_boxes_mpl(image, boxes, ["bg", "a"], save_file=str(out))
    assert out.exists()


def test_display_top_masks_smoke(tmp_path, rng):
    image = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    masks = rng.rand(32, 32, 3) > 0.5
    out = tmp_path / "top.png"
    visualize.display_top_masks(image, masks, np.array([1, 1, 2]),
                                ["bg", "a", "b"], save_path=str(out))
    assert out.exists()


def test_plot_overlaps_and_pr(tmp_path, rng):
    out1 = tmp_path / "pr.png"
    visualize.plot_precision_recall(0.8, [1.0, 0.8, 0.6], [0.0, 0.5, 1.0],
                                    save_path=str(out1))
    out2 = tmp_path / "ov.png"
    visualize.plot_overlaps(np.array([1, 2]), np.array([1]), np.array([0.9]),
                            rng.rand(1, 2), ["bg", "a", "b"],
                            save_path=str(out2))
    assert out1.exists() and out2.exists()


def test_display_weight_stats(capsys):
    params = {"layer": {"kernel": np.ones((3, 3)), "bias": np.zeros(3)}}
    rows = visualize.display_weight_stats(params)
    assert len(rows) == 3  # header + 2 params
    out = capsys.readouterr().out
    assert "dead?" in out  # constant kernel flagged


def test_random_colors_distinct():
    colors = visualize.random_colors(5, seed=0)
    assert len(set(colors)) == 5


def test_display_differences_smoke(tmp_path, rng):
    image = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    gt_boxes = np.array([[5, 5, 30, 30]], dtype=np.float32)
    gt_masks = np.zeros((64, 64, 1), bool); gt_masks[8:28, 8:28, 0] = True
    pred_boxes = np.array([[6, 6, 31, 31], [40, 40, 60, 60]], dtype=np.float32)
    pred_masks = np.zeros((64, 64, 2), bool)
    pred_masks[8:28, 8:28, 0] = True
    pred_masks[42:58, 42:58, 1] = True
    out = tmp_path / "diff.png"
    gt_match, pred_match, overlaps = visualize.display_differences(
        image, gt_boxes, np.array([1]), gt_masks,
        pred_boxes, np.array([1, 2]), np.array([0.9, 0.8]), pred_masks,
        ["bg", "a", "b"], save_path=str(out))
    assert out.exists() and out.stat().st_size > 0
    assert pred_match[0] == 0      # matched the GT
    assert pred_match[1] == -1     # false positive


def test_draw_rois_smoke(tmp_path, rng):
    image = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    rois = (rng.rand(20, 4) * 32).astype(np.float32)
    rois[:, 2:] += rois[:, :2]  # make x2>x1, y2>y1
    refined = rois + 2
    mask = rng.rand(64, 64, 20) > 0.8
    class_ids = rng.randint(0, 3, 20)
    out = tmp_path / "rois.png"
    visualize.draw_rois(image, rois, refined, mask, class_ids,
                        ["bg", "a", "b"], limit=8, save_path=str(out))
    assert out.exists() and out.stat().st_size > 0


def test_draw_box_numpy():
    from mask_yolo_tpu.utils.visualize import draw_box

    img = np.zeros((32, 32, 3), np.uint8)
    draw_box(img, (4, 6, 20, 25), (255, 0, 0), thickness=2)
    assert (img[6:8, 4:21, 0] == 255).all()     # top edge
    assert (img[24:26, 4:21, 0] == 255).all()   # bottom edge
    assert (img[6:26, 4:6, 0] == 255).all()     # left edge
    assert img[15, 12, 0] == 0                  # interior untouched


def test_draw_boxes_full_debug_overlay(tmp_path):
    """The reference's full draw_boxes (visualize.py:368-468): boxes +
    refined boxes + captions + visibilities + masks in one overlay."""
    from mask_yolo_tpu.utils.visualize import draw_boxes

    rng = np.random.RandomState(0)
    image = rng.randint(0, 255, (64, 64, 3), dtype=np.uint8)
    boxes = np.array([[4, 4, 20, 20], [30, 30, 60, 58], [0, 0, 0, 0]],
                     np.float32)
    refined = np.array([[6, 6, 22, 22], [28, 28, 58, 56], [1, 1, 5, 5]],
                       np.float32)
    masks = np.zeros((64, 64, 3), bool)
    masks[8:16, 8:16, 0] = True
    out = str(tmp_path / "draw_boxes.png")
    draw_boxes(image, boxes=boxes, refined_boxes=refined, masks=masks,
               captions=["a", "b 0.5", None], visibilities=[2, 1, 0],
               title="debug", save_path=out)
    import os
    assert os.path.getsize(out) > 0
