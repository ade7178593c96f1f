import numpy as np
import pytest

from mask_yolo_tpu.config import Config


def test_defaults_match_reference_operating_point():
    cfg = Config()
    assert cfg.GRID_H == 7 and cfg.GRID_W == 7
    assert cfg.N_BOX == 5
    assert cfg.grid_boxes == 245
    assert cfg.TRAIN_ROIS_PER_IMAGE == 245
    assert cfg.MASK_SHAPE == [28, 28]
    assert cfg.IMAGE_SHAPE == [224, 224, 3]
    assert cfg.anchors_wh.shape == (5, 2)


def test_subclass_override():
    class Sub(Config):
        NUM_CLASSES = 1 + 3
        LABELS = ["background", "x", "y", "z"]

    cfg = Sub()
    assert cfg.NUM_CLASSES == 4
    assert cfg.class_weights.shape == (4,)


def test_validation_rejects_bad_image_size():
    class Bad(Config):
        IMAGE_SHAPE = [225, 224, 3]

    with pytest.raises(ValueError):
        Bad()


def test_validation_rejects_anchor_mismatch():
    class Bad(Config):
        N_BOX = 3  # but 5 anchor pairs

    with pytest.raises(ValueError):
        Bad()


def test_static_key_hashable_and_distinct():
    class A(Config):
        NUM_CLASSES = 2
        LABELS = ["bg", "x"]

    class B(Config):
        NUM_CLASSES = 3
        LABELS = ["bg", "x", "y"]

    assert hash(A().static_key()) != hash(B().static_key())


def test_display_runs(capsys):
    Config().display()
    out = capsys.readouterr().out
    assert "GRID_H" in out and "ANCHORS" in out
