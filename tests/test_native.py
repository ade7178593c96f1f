"""Golden tests for the native (C++) host image kernels: every kernel must
agree with the numpy reference implementation in utils/image.py — bitwise
for the integer/boolean ops, bitwise for bilinear too (the build disables
FP contraction so the float lerp rounds identically)."""

import numpy as np
import pytest

from mask_yolo_tpu import native
from mask_yolo_tpu.utils import image as image_ops

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native extension did not build")


@pytest.fixture
def no_native(monkeypatch):
    """Force utils.image onto its numpy path."""
    monkeypatch.setattr(native, "LIB", None)


def _rng():
    return np.random.RandomState(0)


@pytest.mark.parametrize("shape,out", [((17, 23, 3), (64, 64)),
                                       ((224, 224, 3), (100, 150)),
                                       ((5, 5), (11, 7)),
                                       ((56, 31, 1), (56, 62))])
def test_resize_bilinear_matches_numpy(shape, out, monkeypatch):
    img = (_rng().rand(*shape) * 255).astype(np.float32)
    got = image_ops.resize_bilinear(img, out)
    monkeypatch.setattr(native, "LIB", None)
    ref = image_ops.resize_bilinear(img, out)
    np.testing.assert_array_equal(got, ref)


def test_resize_bilinear_uint8_and_align_corners(monkeypatch):
    img = (_rng().rand(33, 47, 3) * 255).astype(np.uint8)
    got = image_ops.resize_bilinear(img, (224, 224), align_corners=True)
    monkeypatch.setattr(native, "LIB", None)
    ref = image_ops.resize_bilinear(img, (224, 224), align_corners=True)
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("zoom", [(2.0, 2.0), (0.25, 0.25), (1.7, 0.6)])
def test_resize_nearest_matches_numpy(zoom, monkeypatch):
    mask = _rng().rand(40, 56, 5) > 0.5
    got = image_ops.resize_nearest(mask, zoom)
    monkeypatch.setattr(native, "LIB", None)
    ref = image_ops.resize_nearest(mask, zoom)
    assert got.dtype == ref.dtype == bool
    np.testing.assert_array_equal(got, ref)


def test_resize_nearest_2d_uint8(monkeypatch):
    mask = (_rng().rand(31, 29) * 255).astype(np.uint8)
    got = image_ops.resize_nearest(mask, (3.1, 0.8))
    monkeypatch.setattr(native, "LIB", None)
    ref = image_ops.resize_nearest(mask, (3.1, 0.8))
    assert got.dtype == ref.dtype
    np.testing.assert_array_equal(got, ref)


def test_polygon_mask_matches_numpy(monkeypatch):
    rng = _rng()
    for _ in range(8):
        n = rng.randint(3, 9)
        xs = rng.rand(n) * 60 - 5   # include out-of-bounds vertices
        ys = rng.rand(n) * 60 - 5
        got = image_ops.polygon_mask(xs, ys, (48, 48))
        with pytest.MonkeyPatch.context() as mp:
            mp.setattr(native, "LIB", None)
            ref = image_ops.polygon_mask(xs, ys, (48, 48))
        np.testing.assert_array_equal(got, ref)


def test_degenerate_polygon_empty():
    got = image_ops.polygon_mask([1.0, 2.0], [1.0, 2.0], (8, 8))
    assert not got.any()


def test_resize_edge_cases(monkeypatch):
    img = (_rng().rand(37, 41, 3) * 255).astype(np.float32)
    for out in [(1, 1), (1, 64), (64, 1)]:
        got = image_ops.resize_bilinear(img, out)
        with pytest.MonkeyPatch.context() as mp:
            mp.setattr(native, "LIB", None)
            ref = image_ops.resize_bilinear(img, out)
        np.testing.assert_array_equal(got, ref)
    tiny = image_ops.resize_nearest(np.ones((5, 5), bool), (0.2, 0.2))
    assert tiny.shape == (1, 1) and tiny.all()


def test_polygon_fully_outside_canvas():
    got = image_ops.polygon_mask([100.0, 140.0, 120.0],
                                 [100.0, 100.0, 140.0], (48, 48))
    assert not got.any()


def test_fill_circle_matches_numpy(monkeypatch):
    rng = _rng()
    for cx, cy, r in [(10, 12, 5), (0, 0, 3), (47, 2, 9), (24, 24, 40)]:
        img = np.zeros((48, 48, 3), np.float32)
        image_ops.fill_circle(img, cx, cy, r, (1.0, 2.0, 3.0))
        ref = np.zeros((48, 48, 3), np.float32)
        with pytest.MonkeyPatch.context() as mp:
            mp.setattr(native, "LIB", None)
            image_ops.fill_circle(ref, cx, cy, r, (1.0, 2.0, 3.0))
        np.testing.assert_array_equal(img, ref)


def test_shapes_dataset_identical_with_native(monkeypatch):
    """End-to-end: the Shapes fixture generator produces identical images,
    masks and boxes whether the kernels are native or numpy."""
    from mask_yolo_tpu.data.shapes import ShapesDataset

    def build():
        ds = ShapesDataset()
        ds.load_shapes(4, 64, 64, seed=3)
        ds.prepare()
        return ([ds.load_image(i) for i in ds.image_ids],
                [ds.load_mask(i) for i in ds.image_ids])

    imgs_nat, masks_nat = build()
    monkeypatch.setattr(native, "LIB", None)
    imgs_ref, masks_ref = build()
    for a, b in zip(imgs_nat, imgs_ref):
        np.testing.assert_array_equal(a, b)
    for (m0, c0), (m1, c1) in zip(masks_nat, masks_ref):
        np.testing.assert_array_equal(m0, m1)
        np.testing.assert_array_equal(c0, c1)
