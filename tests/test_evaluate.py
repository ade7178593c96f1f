"""Evaluation-harness tests: evaluate_dataset runs end-to-end over a Shapes
dataset via the public MaskYOLO API and produces sane metric structure; a
synthetic perfect-prediction case scores AP = 1."""

import numpy as np

from mask_yolo_tpu import MaskYOLO, evaluate_dataset
from mask_yolo_tpu.data.loader import load_image_gt
from mask_yolo_tpu.data.shapes import ShapesDataset
from mask_yolo_tpu.utils import metrics


def test_evaluate_dataset_untrained(tmp_path):
    from conftest import TinyConfig

    class ShapesTiny(TinyConfig):
        NUM_CLASSES = 4
        LABELS = ["background", "square", "circle", "triangle"]

    cfg = ShapesTiny()
    ds = ShapesDataset()
    ds.load_shapes(4, 64, 64, seed=11)
    ds.prepare()

    model = MaskYOLO(mode="inference", config=cfg)
    result = evaluate_dataset(model, ds, cfg, batch_size=2)
    assert result["n_images"] == 4
    assert 0.0 <= result["box_ap50"] <= 1.0
    assert 0.0 <= result["mask_ap50"] <= 1.0
    assert len(result["per_image"]) == 4
    for row in result["per_image"]:
        assert row["n_gt"] >= 1

    # mesh=True shards every eval batch over the 8-device 'data' axis and
    # reproduces the single-device metrics exactly (pure DP)
    sharded = evaluate_dataset(model, ds, cfg, batch_size=8, mesh=True)
    assert sharded["box_ap50"] == result["box_ap50"]
    assert sharded["mask_ap50"] == result["mask_ap50"]

    # duck-typed models with a plain detect_batch(images) (the int8-path
    # adapter in tools/quality_run.py) must keep working when mesh is unset
    class Adapter:
        def detect_batch(self, images):
            return model.detect_batch(images)

    ducked = evaluate_dataset(Adapter(), ds, cfg, batch_size=2)
    assert ducked["box_ap50"] == result["box_ap50"]


def test_perfect_predictions_score_ap1():
    """Feeding the GT back as predictions must give AP50 = 1 on boxes and
    (near) 1 on masks."""
    from conftest import TinyConfig

    class ShapesTiny(TinyConfig):
        NUM_CLASSES = 4
        LABELS = ["background", "square", "circle", "triangle"]

    cfg = ShapesTiny()
    ds = ShapesDataset()
    ds.load_shapes(3, 64, 64, seed=3)
    ds.prepare()
    for image_id in ds.image_ids:
        _, gt_ids, gt_boxes, gt_masks = load_image_gt(ds, cfg, image_id)
        scores = np.linspace(0.9, 0.5, len(gt_ids))
        ap, _, _, _ = metrics.compute_ap(
            gt_boxes.astype(np.float64), gt_ids, None,
            gt_boxes.astype(np.float64), gt_ids, scores)
        assert np.isclose(ap, 1.0)
        mask_ap, _, _, _ = metrics.compute_ap(
            gt_boxes, gt_ids, gt_masks, gt_boxes, gt_ids, scores, gt_masks)
        assert np.isclose(mask_ap, 1.0)


def test_evaluate_dataset_pads_trailing_batch():
    """Image counts not divisible by batch_size exercise the pad path
    (the jitted program keeps a fixed batch shape)."""
    from conftest import TinyConfig

    class ShapesTiny(TinyConfig):
        NUM_CLASSES = 4
        LABELS = ["background", "square", "circle", "triangle"]

    cfg = ShapesTiny()
    ds = ShapesDataset()
    ds.load_shapes(5, 64, 64, seed=21)
    ds.prepare()
    model = MaskYOLO(mode="inference", config=cfg)
    result = evaluate_dataset(model, ds, cfg, batch_size=2)
    assert result["n_images"] == 5
    assert len(result["per_image"]) == 5
