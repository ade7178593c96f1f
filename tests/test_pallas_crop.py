"""Fused Pallas ROI-crop kernel vs ops/roi_align.crop_and_resize
(interpret mode on CPU; real-TPU compilation is exercised by
tools/bench_416.py --set QUANT_PALLAS_CROP=True)."""

import jax
import jax.numpy as jnp
import numpy as np

from mask_yolo_tpu.ops.pallas_crop import crop_rois
from mask_yolo_tpu.ops.roi_align import crop_and_resize


def _boxes(rng, b, k):
    x1 = rng.rand(b, k).astype(np.float32) * 0.6
    y1 = rng.rand(b, k).astype(np.float32) * 0.6
    x2 = x1 + 0.05 + rng.rand(b, k).astype(np.float32) * (0.95 - x1 - 0.05)
    y2 = y1 + 0.05 + rng.rand(b, k).astype(np.float32) * (0.95 - y1 - 0.05)
    return np.stack([x1, y1, x2, y2], axis=-1)


def test_crop_kernel_matches_xla(rng):
    b, h, w, c, k, pool = 2, 20, 20, 256, 7, 6
    fmap = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    boxes = jnp.asarray(_boxes(rng, b, k))

    want = np.asarray(crop_and_resize(fmap, boxes, (pool, pool),
                                      dtype=jnp.bfloat16)).astype(np.float32)
    got = np.asarray(crop_rois(fmap, boxes, pool=pool, k_block=4,
                               interpret=True)).astype(np.float32)
    assert got.shape == want.shape
    # both paths round intermediates to bf16; accumulation order differs
    scale = np.abs(want).max() + 1e-6
    np.testing.assert_allclose(got / scale, want / scale, atol=3e-2)
    # agreement must be tight in aggregate, not just bounded
    assert np.mean(np.abs(got - want)) < 2e-2 * scale


def test_crop_kernel_k_padding_and_blocks(rng):
    """K not divisible by k_block: padded slots are computed then sliced
    off; every real ROI must be identical to a single-block run."""
    b, h, w, c, k, pool = 1, 16, 16, 128, 5, 4
    fmap = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    boxes = jnp.asarray(_boxes(rng, b, k))
    a = np.asarray(crop_rois(fmap, boxes, pool=pool, k_block=2,
                             interpret=True))
    bb = np.asarray(crop_rois(fmap, boxes, pool=pool, k_block=8,
                              interpret=True))
    np.testing.assert_allclose(a, bb, rtol=0, atol=1e-6)


def test_crop_kernel_out_of_range_boxes(rng):
    """Boxes outside [0, 1] zero the out-of-range taps exactly like
    crop_and_resize (reference tf.image.crop_and_resize semantics)."""
    b, h, w, c, pool = 1, 12, 12, 128, 4
    fmap = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    boxes = jnp.asarray(np.array(
        [[[-0.5, -0.5, 0.5, 0.5], [0.6, 0.6, 1.4, 1.4]]], np.float32))
    want = np.asarray(crop_and_resize(fmap, boxes, (pool, pool),
                                      dtype=jnp.bfloat16)).astype(np.float32)
    got = np.asarray(crop_rois(fmap, boxes, pool=pool, k_block=2,
                               interpret=True)).astype(np.float32)
    scale = np.abs(want).max() + 1e-6
    np.testing.assert_allclose(got / scale, want / scale, atol=3e-2)


def test_mask_outputs_pallas_crop_path(rng):
    """_mask_outputs(pallas_crop=True) runs the kernel-cropped activations
    through the same int8 conv stack and stays close to the XLA-crop
    result (both crops round to bf16)."""
    from conftest import TinyConfig
    from mask_yolo_tpu import quant
    from mask_yolo_tpu.models.network import MaskYoloNet

    class QConfig(TinyConfig):
        NUM_CLASSES = 4
        LABELS = ["background", "a", "b", "c"]
        COMPUTE_DTYPE = "float32"

    cfg = QConfig()
    net = MaskYoloNet(num_classes=cfg.NUM_CLASSES, n_box=cfg.N_BOX,
                      top_feature_map_depth=cfg.TOP_FEATURE_MAP_DEPTH,
                      mask_pool_size=cfg.MASK_POOL_SIZE, backbone=cfg.BACKBONE)
    img = jnp.zeros((2, *cfg.IMAGE_SHAPE), jnp.float32)
    variables = net.init(jax.random.PRNGKey(3), img,
                         jnp.zeros((2, 4, 4), jnp.float32), train=False)
    images = jnp.asarray(rng.rand(2, *cfg.IMAGE_SHAPE).astype(np.float32))
    det = quant.QuantizedDetector.from_variables(
        jax.device_get(variables), cfg, np.asarray(images))
    _, fmap = jax.jit(lambda im: det.trunk(im, quant=True))(images)
    rois = jnp.asarray(_boxes(rng, 2, 4))

    ref = np.asarray(quant._mask_outputs(
        det.graph, rois, fmap, cfg.MASK_POOL_SIZE, cfg.NUM_CLASSES,
        quant=True))
    # interpret-mode kernel inside the otherwise identical pipeline
    import mask_yolo_tpu.ops.pallas_crop as pc
    orig = pc.crop_rois

    def interp_crop(f, b, pool=14, k_block=8, interpret=False):
        return orig(f, b, pool=pool, k_block=k_block, interpret=True)

    pc.crop_rois = interp_crop
    try:
        got = np.asarray(quant._mask_outputs(
            det.graph, rois, fmap, cfg.MASK_POOL_SIZE, cfg.NUM_CLASSES,
            quant=True, pallas_crop=True))
    finally:
        pc.crop_rois = orig
    assert got.shape == ref.shape
    # sigmoid outputs; int8 requant after a bf16 crop — 0.5-threshold
    # decisions must agree essentially everywhere
    agree = np.mean((got >= 0.5) == (ref >= 0.5))
    assert agree > 0.995, agree
    assert np.mean(np.abs(got - ref)) < 2e-2
