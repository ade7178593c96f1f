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


def test_ap_eval_callback_during_train(tmp_path):
    """make_ap_eval_callback: runs inside MaskYOLO.train on its cadence with
    the in-flight weights, appends JSONL history, and saves best weights."""
    import json
    import os

    from mask_yolo_tpu import make_ap_eval_callback
    from conftest import TinyConfig

    class ShapesTiny(TinyConfig):
        NUM_CLASSES = 4
        LABELS = ["background", "square", "circle", "triangle"]
        BATCH_SIZE = 4
        VALIDATION_STEPS = 1

    cfg = ShapesTiny()
    tr = ShapesDataset(); tr.load_shapes(4, 64, 64, seed=0); tr.prepare()
    va = ShapesDataset(); va.load_shapes(4, 64, 64, seed=1); va.prepare()

    hist = tmp_path / "ap_history.jsonl"
    best = tmp_path / "best_weights"
    cb = make_ap_eval_callback(va, cfg, every=2, batch_size=4,
                               score_threshold=0.0,
                               history_path=str(hist),
                               best_weights_path=str(best), verbose=False)
    m = MaskYOLO(mode="training", config=cfg, model_dir=str(tmp_path / "ckpt"))
    m.train(tr, va, learning_rate=1e-3, epochs=4, layers="all",
            custom_callbacks=[cb], verbose=False)

    # every=2 over 4 epochs → evaluations after epochs 2 and 4
    assert [e["epoch"] for e in cb.history] == [2, 4]
    lines = [json.loads(l) for l in hist.read_text().splitlines()]
    assert [e["epoch"] for e in lines] == [2, 4]
    assert all("box_ap50" in e and "mask_ap50" in e for e in lines)
    assert cb.best >= 0.0
    assert os.path.exists(best)  # best weights saved at least once

    # best weights load back through the public API
    infer = MaskYOLO(mode="inference", config=cfg)
    infer.load_weights(str(best))
