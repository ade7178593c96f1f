"""ResNet-50+FPN backbone tests: output contract matches the MobileNet
backbone (stride-8, 512 channels) so every downstream component works
unchanged, and a training step runs through it."""

import jax
import jax.numpy as jnp
import numpy as np


def _cfg():
    from conftest import TinyConfig

    class RCfg(TinyConfig):
        NUM_CLASSES = 4
        LABELS = ["background", "square", "circle", "triangle"]
        BACKBONE = "resnet50_fpn"
        BATCH_SIZE = 2

    return RCfg()


def test_resnet_fpn_output_contract(rng):
    cfg = _cfg()
    from mask_yolo_tpu.models.network import MaskYoloNet

    net = MaskYoloNet(num_classes=cfg.NUM_CLASSES, n_box=cfg.N_BOX,
                      top_feature_map_depth=cfg.TOP_FEATURE_MAP_DEPTH,
                      mask_pool_size=cfg.MASK_POOL_SIZE, backbone=cfg.BACKBONE)
    img = jnp.asarray(rng.rand(2, *cfg.IMAGE_SHAPE).astype(np.float32))
    rois = jnp.zeros((2, 4, 4), jnp.float32)
    variables = jax.jit(lambda: net.init(jax.random.PRNGKey(0), img, rois,
                                         train=False))()
    grid, fmap = jax.jit(
        lambda v, im: net.apply(v, im, train=False, method=net.trunk))(
        variables, img)
    h, w = cfg.IMAGE_SHAPE[:2]
    # stride-8 contract shared with the mobilenet backbone
    assert fmap.shape == (2, h // 8, w // 8, cfg.TOP_FEATURE_MAP_DEPTH)
    assert grid.shape == (2, cfg.GRID_H, cfg.GRID_W, cfg.N_BOX,
                          5 + cfg.NUM_CLASSES)


def test_resnet_fpn_train_step(rng):
    cfg = _cfg()
    from mask_yolo_tpu.data.pipeline import BatchGenerator, preload_dataset
    from mask_yolo_tpu.data.shapes import ShapesDataset
    from mask_yolo_tpu.models.network import MaskYoloNet
    from mask_yolo_tpu.train import state as state_lib
    from mask_yolo_tpu.train import trainer as trainer_lib

    ds = ShapesDataset()
    ds.load_shapes(2, 64, 64, seed=9)
    ds.prepare()
    data = preload_dataset(ds, cfg)
    gen = BatchGenerator(data, cfg, mode="training", shuffle=False)

    net = MaskYoloNet(num_classes=cfg.NUM_CLASSES, n_box=cfg.N_BOX,
                      top_feature_map_depth=cfg.TOP_FEATURE_MAP_DEPTH,
                      mask_pool_size=cfg.MASK_POOL_SIZE, backbone=cfg.BACKBONE)
    img = jnp.zeros((cfg.BATCH_SIZE, *cfg.IMAGE_SHAPE), jnp.float32)
    rois = jnp.zeros((cfg.BATCH_SIZE, cfg.TRAIN_ROIS_PER_IMAGE, 4), jnp.float32)
    variables = jax.jit(lambda: net.init(jax.random.PRNGKey(1), img, rois,
                                         train=False))()

    tx = state_lib.make_optimizer(1e-3, cfg)
    step = trainer_lib.make_train_step(net, cfg, tx, mode="training")
    state = state_lib.create_train_state(
        jax.tree.map(jnp.array, variables["params"]),
        jax.tree.map(jnp.array, variables.get("batch_stats", {})), tx)
    batch = {k: jnp.asarray(v) for k, v in gen[0].items()}
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1


def test_fpn_pyramid_mask_branch(rng):
    """trunk_pyramid returns P3/P4/P5 and the mask branch pools each ROI
    from its FPN-assigned level (multi-level ROIAlign path)."""
    cfg = _cfg()
    from mask_yolo_tpu.models.network import MaskYoloNet

    net = MaskYoloNet(num_classes=cfg.NUM_CLASSES, n_box=cfg.N_BOX,
                      top_feature_map_depth=cfg.TOP_FEATURE_MAP_DEPTH,
                      mask_pool_size=cfg.MASK_POOL_SIZE, backbone=cfg.BACKBONE)
    img = jnp.asarray(rng.rand(2, *cfg.IMAGE_SHAPE).astype(np.float32))
    variables = jax.jit(lambda: net.init(
        jax.random.PRNGKey(0), img, jnp.zeros((2, 4, 4), jnp.float32),
        train=False))()

    grid, pyr = jax.jit(
        lambda v, im: net.apply(v, im, train=False, method=net.trunk_pyramid))(
        variables, img)
    h, w = cfg.IMAGE_SHAPE[:2]
    assert len(pyr) == 3
    assert pyr[0].shape == (2, h // 8, w // 8, cfg.TOP_FEATURE_MAP_DEPTH)
    assert pyr[1].shape == (2, h // 16, w // 16, cfg.TOP_FEATURE_MAP_DEPTH)
    assert pyr[2].shape == (2, h // 32, w // 32, cfg.TOP_FEATURE_MAP_DEPTH)

    rois = jnp.asarray(np.asarray(
        [[[0.1, 0.1, 0.3, 0.3], [0.0, 0.0, 1.0, 1.0]]] * 2, np.float32))
    masks = jax.jit(lambda v, r, p: net.apply(
        v, r, tuple(p), train=False, method=net.mask_branch))(
        variables, rois, pyr)
    s = 2 * cfg.MASK_POOL_SIZE
    assert masks.shape == (2, 2, s, s, cfg.NUM_CLASSES)
    assert np.isfinite(np.asarray(masks)).all()
