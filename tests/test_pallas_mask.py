"""Fused Pallas mask-branch kernel vs the XLA int8 path (interpret mode on
CPU; the real-TPU compilation is exercised by bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mask_yolo_tpu import quant
from mask_yolo_tpu.models.network import MaskYoloNet
from mask_yolo_tpu.ops import pallas_mask


@pytest.fixture(scope="module")
def qgraph(rng):
    from conftest import TinyConfig

    class QConfig(TinyConfig):
        NUM_CLASSES = 4
        LABELS = ["background", "square", "circle", "triangle"]
        COMPUTE_DTYPE = "float32"

    cfg = QConfig()
    net = MaskYoloNet(num_classes=cfg.NUM_CLASSES, n_box=cfg.N_BOX,
                      top_feature_map_depth=cfg.TOP_FEATURE_MAP_DEPTH,
                      mask_pool_size=cfg.MASK_POOL_SIZE, backbone=cfg.BACKBONE)
    img = jnp.zeros((2, *cfg.IMAGE_SHAPE), jnp.float32)
    variables = net.init(jax.random.PRNGKey(3), img,
                         jnp.zeros((2, 4, 4), jnp.float32), train=False)
    # amplify the mask-branch weights so sigmoid outputs spread away from
    # 0.5 (freshly-initialized activations collapse to ~1e-5 through the
    # deep stack, making threshold comparisons meaningless)
    variables = jax.device_get(variables)
    mask_p = variables["params"]["mask"]
    for i in range(1, 5):
        mask_p[f"mask_conv{i}"]["kernel"] = mask_p[f"mask_conv{i}"]["kernel"] * 4.0
    mask_p["mask_out"]["kernel"] = mask_p["mask_out"]["kernel"] * 400.0
    images = jnp.asarray(rng.rand(2, *cfg.IMAGE_SHAPE).astype(np.float32))
    det = quant.QuantizedDetector.from_variables(variables, cfg,
                                                 np.asarray(images))
    _, fmap = jax.jit(lambda im: det.trunk(im, quant=True))(images)
    return cfg, det, np.asarray(fmap)


def test_fused_kernel_matches_xla_int8_path(qgraph, rng):
    cfg, det, fmap = qgraph
    b = fmap.shape[0]
    k = 3
    boxes = np.stack([
        [[0.10, 0.10, 0.60, 0.60], [0.30, 0.20, 0.90, 0.80],
         [0.05, 0.40, 0.45, 0.95]]] * b).astype(np.float32)
    classes = np.array([[1, 2, 3], [3, 1, 2]], np.int32)

    weights = pallas_mask.pack_mask_weights(det.graph, cfg.NUM_CLASSES)
    got = pallas_mask.fused_mask_branch(
        jnp.asarray(fmap), jnp.asarray(boxes), jnp.asarray(classes), weights,
        pool=cfg.MASK_POOL_SIZE, num_classes=cfg.NUM_CLASSES, interpret=True)

    ref_all = jax.jit(lambda r, f: det.mask_branch(r, f, quant=True))(
        jnp.asarray(boxes), jnp.asarray(fmap))   # [B, K, 28, 28, C]
    onehot = jax.nn.one_hot(classes, cfg.NUM_CLASSES)
    ref = np.einsum("bkhwc,bkc->bkhw", np.asarray(ref_all), onehot)

    got = np.asarray(got)
    assert got.shape == ref.shape
    # identical int8 arithmetic; only the crop's bf16 rounding can differ →
    # sigmoid outputs should agree tightly
    # identical int8 arithmetic; the only divergence source is bf16 rounding
    # in the crop, which can flip an input by one int8 step and ripple — so
    # compare distributions, not bit-exactness: errors are tiny almost
    # everywhere and the thresholded masks agree off the 0.5 boundary
    err = np.abs(got - ref)
    assert err.mean() < 5e-3, err.mean()
    assert (err > 0.05).mean() < 5e-3, (err > 0.05).mean()
    decided = np.abs(ref - 0.5) > 0.05
    assert decided.mean() > 0.2  # the amplified fixture has real spread
    agree = ((got >= 0.5) == (ref >= 0.5))[decided].mean()
    assert agree > 0.995, agree


def test_fused_kernel_out_of_range_boxes_zero_crop(qgraph):
    """Boxes fully outside the image sample zeros (crop extrapolation),
    still produce a valid sigmoid output (= sigmoid of bias chain)."""
    cfg, det, fmap = qgraph
    boxes = np.asarray([[[2.0, 2.0, 3.0, 3.0]]] * fmap.shape[0],
                       dtype=np.float32)
    classes = np.zeros((fmap.shape[0], 1), np.int32)
    weights = pallas_mask.pack_mask_weights(det.graph, cfg.NUM_CLASSES)
    out = pallas_mask.fused_mask_branch(
        jnp.asarray(fmap), jnp.asarray(boxes), jnp.asarray(classes), weights,
        pool=cfg.MASK_POOL_SIZE, num_classes=cfg.NUM_CLASSES, interpret=True)
    out = np.asarray(out)
    assert np.all(np.isfinite(out))
    assert np.all((out >= 0) & (out <= 1))


def test_fused_kernel_k_blocked_matches_single_block(qgraph, rng):
    """K-blocked grid (k_block < K, K not a multiple) must produce exactly
    the same masks as the single-block layout — the restructuring that makes
    K=100 compile (VERDICT r2 #4b)."""
    cfg, det, fmap = qgraph
    b = fmap.shape[0]
    k = 7  # with k_block=3 → 3 blocks, last one padded
    lo = rng.uniform(0.0, 0.5, size=(b, k, 2)).astype(np.float32)
    span = rng.uniform(0.1, 0.45, size=(b, k, 2)).astype(np.float32)
    boxes = np.concatenate([lo, lo + span], axis=-1)
    classes = rng.randint(0, cfg.NUM_CLASSES, size=(b, k)).astype(np.int32)
    weights = pallas_mask.pack_mask_weights(det.graph, cfg.NUM_CLASSES)

    full = pallas_mask.fused_mask_branch(
        jnp.asarray(fmap), jnp.asarray(boxes), jnp.asarray(classes), weights,
        pool=cfg.MASK_POOL_SIZE, num_classes=cfg.NUM_CLASSES, interpret=True,
        k_block=k)
    blocked = pallas_mask.fused_mask_branch(
        jnp.asarray(fmap), jnp.asarray(boxes), jnp.asarray(classes), weights,
        pool=cfg.MASK_POOL_SIZE, num_classes=cfg.NUM_CLASSES, interpret=True,
        k_block=3)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(blocked))
