"""End-to-end pipeline tests on the tiny config: on-chip yolo decode+NMS vs
the host golden decoder, and full detect smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mask_yolo_tpu import pipelines
from mask_yolo_tpu.models.network import MaskYoloNet
from mask_yolo_tpu.utils.host_ops import decode_one_yolo_output


@pytest.fixture(scope="module")
def tiny_net_and_vars():
    from conftest import TinyConfig

    cfg = TinyConfig()
    net = MaskYoloNet(num_classes=cfg.NUM_CLASSES, n_box=cfg.N_BOX,
                      top_feature_map_depth=cfg.TOP_FEATURE_MAP_DEPTH,
                      mask_pool_size=cfg.MASK_POOL_SIZE, backbone=cfg.BACKBONE)
    img = jnp.zeros((2, *cfg.IMAGE_SHAPE), jnp.float32)
    rois = jnp.zeros((2, cfg.TRAIN_ROIS_PER_IMAGE, 4), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), img, rois, train=False)
    return cfg, net, variables


def test_infer_yolo_matches_host_decoder(tiny_net_and_vars, rng):
    """The on-chip decode+per-class-NMS must agree with the host golden
    (decode_one_yolo_output port) on surviving boxes and scores."""
    cfg, net, variables = tiny_net_and_vars
    images = jnp.asarray(rng.rand(2, *cfg.IMAGE_SHAPE).astype(np.float32))

    out = jax.device_get(pipelines.infer_yolo_outputs(net, variables, images, cfg))

    # host path: grid from the same trunk
    grid, _ = net.apply(variables, images, train=False, method=net.trunk)
    grid = np.asarray(grid)
    for b in range(2):
        host_boxes = decode_one_yolo_output(
            grid[b].copy(), np.asarray(cfg.ANCHORS), cfg.NUM_CLASSES,
            obj_threshold=cfg.OBJ_THRESHOLD, nms_threshold=cfg.NMS_THRESHOLD)
        dev_idx = np.where(out["valid"][b])[0]
        assert len(dev_idx) == len(host_boxes)
        got = sorted(
            (round(float(out["scores"][b, i]), 4),
             int(out["classes"][b, i]),
             round(float(out["boxes"][b, i, 0]), 4))
            for i in dev_idx)
        exp = sorted(
            (round(bx["score"], 4), bx["label"], round(bx["xmin"], 4))
            for bx in host_boxes)
        assert got == exp


def test_detect_outputs_shapes_and_validity(tiny_net_and_vars, rng):
    cfg, net, variables = tiny_net_and_vars
    images = jnp.asarray(rng.rand(2, *cfg.IMAGE_SHAPE).astype(np.float32))
    out = jax.device_get(pipelines.detect_outputs(net, variables, images, cfg))
    k = cfg.DETECTION_MAX_INSTANCES
    h, w = cfg.IMAGE_SHAPE[:2]
    assert out["boxes"].shape == (2, k, 4)
    assert out["masks"].shape == (2, k, h, w)
    assert out["masks"].dtype == bool
    # invalid detections have empty masks
    for b in range(2):
        for i in range(k):
            if not out["valid"][b, i]:
                assert not out["masks"][b, i].any()
    # scores sorted descending (top_k)
    assert np.all(np.diff(out["scores"], axis=1) <= 1e-6)


def test_detect_jits_once(tiny_net_and_vars, rng):
    cfg, net, variables = tiny_net_and_vars
    fn = jax.jit(lambda v, im: pipelines.detect_outputs(net, v, im, cfg))
    images = jnp.asarray(rng.rand(2, *cfg.IMAGE_SHAPE).astype(np.float32))
    out1 = fn(variables, images)
    out2 = fn(variables, images)  # cached
    np.testing.assert_allclose(np.asarray(out1["scores"]),
                               np.asarray(out2["scores"]))


def test_training_loss_finite_and_grads_flow(tiny_net_and_vars, rng):
    cfg, net, variables = tiny_net_and_vars
    b, g = 2, cfg.MAX_GT_INSTANCES
    h, w = cfg.IMAGE_SHAPE[:2]
    batch = {
        "image": jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32)),
        "yolo_target": jnp.zeros((b, cfg.GRID_H, cfg.GRID_W, cfg.N_BOX,
                                  5 + cfg.NUM_CLASSES), jnp.float32),
        "true_boxes": jnp.zeros((b, 1, 1, 1, cfg.TRUE_BOX_BUFFER, 4), jnp.float32),
        "gt_class_ids": jnp.zeros((b, g), jnp.int32),
        "gt_boxes": jnp.zeros((b, g, 4), jnp.float32),
        "gt_masks": jnp.zeros((b, h, w, g), bool),
    }
    # add one GT instance so positives can exist
    batch["yolo_target"] = batch["yolo_target"].at[0, 1, 1, 0].set(
        jnp.asarray([1.5, 1.5, 1.0, 1.0, 1.0] + [0.0, 1.0, 0.0]))
    batch["gt_class_ids"] = batch["gt_class_ids"].at[0, 0].set(1)
    batch["gt_boxes"] = batch["gt_boxes"].at[0, 0].set(
        jnp.asarray([16.0, 16.0, 48.0, 48.0]))
    batch["gt_masks"] = batch["gt_masks"].at[0, 20:40, 20:40, 0].set(True)

    def loss_fn(params):
        v = {"params": params, "batch_stats": variables.get("batch_stats", {})}
        loss, (metrics, _) = pipelines.training_loss(net, v, batch, cfg, seen=10.0)
        return loss, metrics

    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"])
    assert np.isfinite(float(loss))
    gnorm = jnp.sqrt(sum(jnp.sum(x ** 2) for x in jax.tree.leaves(grads)))
    assert float(gnorm) > 0  # gradients flow
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k


def test_data_generator_legacy_surface(tiny_config):
    """The endless-generator API (reference myolo_utils.py:457) yields
    fixed-shape training batches and skips failing images."""
    from mask_yolo_tpu.data.pipeline import data_generator
    from mask_yolo_tpu.data.shapes import ShapesDataset

    class Cfg(type(tiny_config)):
        NUM_CLASSES = 4
        LABELS = ["background", "square", "circle", "triangle"]
        BATCH_SIZE = 2

    cfg = Cfg()
    ds = ShapesDataset()
    ds.load_shapes(5, 64, 64, seed=2)
    ds.prepare()
    gen = data_generator(ds, cfg, shuffle=True)
    b1 = next(gen)
    b2 = next(gen)
    assert b1["image"].shape == (2, 64, 64, 3)
    assert b1["yolo_target"].shape == (2, cfg.GRID_H, cfg.GRID_W, cfg.N_BOX,
                                       5 + cfg.NUM_CLASSES)
    assert b2["gt_masks"].shape[0] == 2
    # a failing load_mask gets skipped, not raised (until the error limit)
    calls = {"n": 0}
    orig = ds.load_image

    def flaky(image_id):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("boom")
        return orig(image_id)

    ds.load_image = flaky
    gen2 = data_generator(ds, cfg, shuffle=False)
    assert next(gen2)["image"].shape[0] == 2


def test_data_generator_threaded_workers(tiny_config):
    """workers>0 runs per-image load on a thread pool; batches are
    deterministic in seed and IDENTICAL for every workers >= 1, including
    with a seeded augmenter (per-image RandomStates derived from the master
    stream at submission)."""
    import numpy as np

    from mask_yolo_tpu.data import augment
    from mask_yolo_tpu.data.pipeline import data_generator
    from mask_yolo_tpu.data.shapes import ShapesDataset

    class Cfg(type(tiny_config)):
        NUM_CLASSES = 4
        LABELS = ["background", "square", "circle", "triangle"]
        BATCH_SIZE = 2

    cfg = Cfg()
    ds = ShapesDataset()
    ds.load_shapes(7, 64, 64, seed=2)
    ds.prepare()

    def pull(workers, n=4):
        gen = data_generator(ds, cfg, shuffle=True, seed=3,
                             augmentation=augment.default_augmenter(seed=1),
                             workers=workers)
        out = [next(gen) for _ in range(n)]
        gen.close()
        return out

    a, b = pull(1), pull(3)
    for ba, bb in zip(a, b):
        assert ba["image"].shape == (2, 64, 64, 3)
        for k in ba:
            np.testing.assert_array_equal(ba[k], bb[k])

    # error-skip policy holds in the threaded path too
    calls = {"n": 0}
    orig = ds.load_image

    def flaky(image_id):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("boom")
        return orig(image_id)

    ds.load_image = flaky
    gen = data_generator(ds, cfg, shuffle=False, workers=2)
    assert next(gen)["image"].shape[0] == 2
    gen.close()
    ds.load_image = orig

    # config.DATA_WORKERS is the default for the workers argument
    class WCfg(Cfg):
        DATA_WORKERS = 2

    gen = data_generator(ds, WCfg(), shuffle=True, seed=3)
    assert next(gen)["image"].shape == (2, 64, 64, 3)
    gen.close()

    # DATA_WORKER_MODE="process" (fork-start workers) produces bit-identical
    # batches to thread mode — same per-image seeds, same computation
    class PCfg(Cfg):
        DATA_WORKER_MODE = "process"

    gen = data_generator(ds, PCfg(), shuffle=True, seed=3,
                         augmentation=augment.default_augmenter(seed=1),
                         workers=2)
    proc_batches = [next(gen) for _ in range(4)]
    gen.close()
    for ba, bb in zip(a, proc_batches):
        for k in ba:
            np.testing.assert_array_equal(ba[k], bb[k])

    with pytest.raises(ValueError, match="thread.*process|process.*thread"):
        class BadCfg(Cfg):
            DATA_WORKER_MODE = "greenlet"

        next(data_generator(ds, BadCfg(), workers=1))


def test_mask_top_k_equivalent_when_few_survivors(tiny_net_and_vars, rng):
    """MASK_TOP_K < K yields the same detection SET (boxes/scores/classes/
    masks per valid slot) whenever the number of NMS survivors fits — only
    the slot ordering may change (valid-first re-sort)."""
    cfg, net, variables = tiny_net_and_vars
    images = jnp.asarray(rng.rand(2, *cfg.IMAGE_SHAPE).astype(np.float32))

    exact = jax.device_get(pipelines.detect_outputs(net, variables, images, cfg))
    n_valid = exact["valid"].sum(axis=1)

    class TopKCfg(type(cfg)):
        MASK_TOP_K = 2

    cfgk = TopKCfg()
    topk = jax.device_get(pipelines.detect_outputs(net, variables, images, cfgk))

    for b in range(2):
        if n_valid[b] > cfgk.MASK_TOP_K:
            continue  # documented deviation domain
        def rows(out):
            idx = np.where(out["valid"][b])[0]
            return sorted(
                (round(float(out["scores"][b, i]), 5),
                 int(out["classes"][b, i]),
                 tuple(np.round(out["boxes"][b, i], 3)),
                 int(out["masks"][b, i].sum()))
                for i in idx)
        assert rows(exact) == rows(topk)
    # slots beyond MASK_TOP_K never carry a mask
    assert not topk["masks"][:, cfgk.MASK_TOP_K:].any()


def test_uint8_images_match_float(tiny_net_and_vars, rng):
    """uint8 batches (normalized on device) are bit-identical to host-
    normalized float batches — /255 commutes with the transfer."""
    cfg, net, variables = tiny_net_and_vars
    raw = (rng.rand(2, *cfg.IMAGE_SHAPE) * 255).astype(np.uint8)
    out_u8 = jax.device_get(pipelines.detect_outputs(
        net, variables, jnp.asarray(raw), cfg))
    out_f32 = jax.device_get(pipelines.detect_outputs(
        net, variables, jnp.asarray(raw.astype(np.float32) / 255.0), cfg))
    np.testing.assert_array_equal(out_u8["scores"], out_f32["scores"])
    np.testing.assert_array_equal(out_u8["masks"], out_f32["masks"])

    # training loss too
    b, g = 2, cfg.MAX_GT_INSTANCES
    h, w = cfg.IMAGE_SHAPE[:2]
    base = {
        "yolo_target": jnp.zeros((b, cfg.GRID_H, cfg.GRID_W, cfg.N_BOX,
                                  5 + cfg.NUM_CLASSES), jnp.float32),
        "true_boxes": jnp.zeros((b, 1, 1, 1, cfg.TRUE_BOX_BUFFER, 4), jnp.float32),
        "gt_class_ids": jnp.zeros((b, g), jnp.int32),
        "gt_boxes": jnp.zeros((b, g, 4), jnp.float32),
        "gt_masks": jnp.zeros((b, h, w, g), bool),
    }
    l_u8, _ = pipelines.training_loss(
        net, variables, dict(base, image=jnp.asarray(raw)), cfg, seen=10.0)
    l_f32, _ = pipelines.training_loss(
        net, variables, dict(base, image=jnp.asarray(raw.astype(np.float32) / 255.0)),
        cfg, seen=10.0)
    # XLA may fuse the on-device u8→f32 divide into the first conv, which
    # reassociates f32 rounding — tiny wobble is expected (a real
    # normalization bug would be off by ~255×, far beyond this tolerance)
    np.testing.assert_allclose(float(l_u8), float(l_f32), rtol=1e-4)


def test_mask_train_top_rois_loss_identical(tiny_net_and_vars, rng):
    """MASK_TRAIN_TOP_ROIS: the training loss is bit-identical to the
    all-ROIs path whenever positives fit in the selection (frozen-BN
    forward; with live BN only the batch statistics differ)."""
    cfg, net, variables = tiny_net_and_vars
    b, g = 2, cfg.MAX_GT_INSTANCES
    h, w = cfg.IMAGE_SHAPE[:2]
    batch = {
        "image": jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32)),
        "yolo_target": jnp.zeros((b, cfg.GRID_H, cfg.GRID_W, cfg.N_BOX,
                                  5 + cfg.NUM_CLASSES), jnp.float32),
        "true_boxes": jnp.zeros((b, 1, 1, 1, cfg.TRUE_BOX_BUFFER, 4), jnp.float32),
        "gt_class_ids": jnp.zeros((b, g), jnp.int32).at[:, 0].set(1),
        "gt_boxes": jnp.zeros((b, g, 4), jnp.float32).at[:, 0].set(
            jnp.asarray([8.0, 8.0, 56.0, 56.0])),
        "gt_masks": jnp.zeros((b, h, w, g), bool).at[:, 10:54, 10:54, 0].set(True),
    }

    class SelCfg(type(cfg)):
        MASK_TRAIN_TOP_ROIS = 4

    l_all, (m_all, _) = pipelines.training_loss(
        net, variables, batch, cfg, seen=1e9, train=False)
    l_sel, (m_sel, _) = pipelines.training_loss(
        net, variables, batch, SelCfg(), seen=1e9, train=False)
    np.testing.assert_allclose(float(l_all), float(l_sel), rtol=1e-6)
    np.testing.assert_allclose(float(m_all["myolo_mask_loss"]),
                               float(m_sel["myolo_mask_loss"]), rtol=1e-6)


def test_infer_yolo_top_n_equivalence(rng):
    """INFER_YOLO_TOP_N pre-selection is output-identical to the full-grid
    per-class NMS while <= N boxes pass OBJ_THRESHOLD (the documented
    condition; CocoStyleConfig sets N=256 on its 845-box grid)."""
    import jax.numpy as jnp

    from conftest import TinyConfig
    from mask_yolo_tpu.models.network import MaskYoloNet
    from mask_yolo_tpu.pipelines import infer_yolo_outputs

    class BigGrid(TinyConfig):
        NUM_CLASSES = 4
        LABELS = ["background", "a", "b", "c"]
        IMAGE_SHAPE = [128, 128, 3]
        IMAGE_MIN_DIM = 128
        IMAGE_MAX_DIM = 128
        GRID_H, GRID_W = 4, 4
        N_BOX = 2
        ANCHORS = [0.6, 0.7, 1.2, 1.1]
        TRAIN_ROIS_PER_IMAGE = 4 * 4 * 2
        INFER_YOLO_TOP_N = 0

    class BigGridTopN(BigGrid):
        INFER_YOLO_TOP_N = 8  # < 32 grid boxes -> pre-selection active

    cfg_full, cfg_topn = BigGrid(), BigGridTopN()
    net = MaskYoloNet(num_classes=cfg_full.NUM_CLASSES, n_box=cfg_full.N_BOX,
                      top_feature_map_depth=cfg_full.TOP_FEATURE_MAP_DEPTH,
                      mask_pool_size=cfg_full.MASK_POOL_SIZE,
                      backbone=cfg_full.BACKBONE)
    import jax
    variables = net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 128, 128, 3), jnp.float32),
                         jnp.zeros((1, 4, 4), jnp.float32), train=False)
    images = jnp.asarray(rng.rand(2, 128, 128, 3).astype(np.float32))
    # untrained net: typically few boxes pass 0.35 threshold -> condition
    # holds; assert it does, then compare outputs exactly
    full = {k: np.asarray(v) for k, v in
            infer_yolo_outputs(net, variables, images, cfg_full).items()}
    active = (full["scores"] > 0).sum(axis=1)
    assert (active <= 8).all(), f"fixture violates <=N condition: {active}"
    topn = {k: np.asarray(v) for k, v in
            infer_yolo_outputs(net, variables, images, cfg_topn).items()}
    np.testing.assert_allclose(topn["scores"], full["scores"], atol=1e-7)
    np.testing.assert_array_equal(topn["valid"], full["valid"])
    keep = full["valid"]
    np.testing.assert_array_equal(topn["classes"][keep], full["classes"][keep])


def test_infer_yolo_per_class_k_equivalence(rng):
    """INFER_YOLO_PER_CLASS_K compaction is output-identical to the exact
    full-grid per-class NMS while every class has <= K boxes above
    OBJ_THRESHOLD (the documented per-class condition; a tighter bound than
    INFER_YOLO_TOP_N's shared pool, so it activates at much smaller K)."""
    import jax
    import jax.numpy as jnp

    from conftest import TinyConfig
    from mask_yolo_tpu.models.network import MaskYoloNet
    from mask_yolo_tpu.pipelines import infer_yolo_outputs

    class BigGrid(TinyConfig):
        NUM_CLASSES = 4
        LABELS = ["background", "a", "b", "c"]
        IMAGE_SHAPE = [128, 128, 3]
        IMAGE_MIN_DIM = 128
        IMAGE_MAX_DIM = 128
        GRID_H, GRID_W = 4, 4
        N_BOX = 2
        ANCHORS = [0.6, 0.7, 1.2, 1.1]
        TRAIN_ROIS_PER_IMAGE = 4 * 4 * 2
        INFER_YOLO_TOP_N = 0
        INFER_YOLO_PER_CLASS_K = 0

    class BigGridPerClass(BigGrid):
        INFER_YOLO_PER_CLASS_K = 6   # < 32 grid boxes -> compaction active
        INFER_YOLO_TOP_N = 8         # must be ignored (per-class wins)

    cfg_full, cfg_pck = BigGrid(), BigGridPerClass()
    net = MaskYoloNet(num_classes=cfg_full.NUM_CLASSES, n_box=cfg_full.N_BOX,
                      top_feature_map_depth=cfg_full.TOP_FEATURE_MAP_DEPTH,
                      mask_pool_size=cfg_full.MASK_POOL_SIZE,
                      backbone=cfg_full.BACKBONE)
    variables = net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 128, 128, 3), jnp.float32),
                         jnp.zeros((1, 4, 4), jnp.float32), train=False)
    images = jnp.asarray(rng.rand(2, 128, 128, 3).astype(np.float32))
    full = {k: np.asarray(v) for k, v in
            infer_yolo_outputs(net, variables, images, cfg_full).items()}
    # untrained net: few boxes pass 0.35 threshold -> the per-class <=K
    # condition holds; assert it, then compare outputs exactly
    active = (full["scores"] > 0).sum(axis=1)
    assert (active <= 6).all(), f"fixture violates <=K condition: {active}"
    pck = {k: np.asarray(v) for k, v in
           infer_yolo_outputs(net, variables, images, cfg_pck).items()}
    np.testing.assert_allclose(pck["scores"], full["scores"], atol=1e-7)
    np.testing.assert_array_equal(pck["valid"], full["valid"])
    keep = full["valid"]
    np.testing.assert_array_equal(pck["classes"][keep], full["classes"][keep])


def test_boundbox_reference_surface():
    """BoundBox (VERDICT r3 'missing' #3): reference-compatible box object
    (myolo_utils.py:161-185) — attribute access, get_label()/get_score(),
    argmax-of-classes derivation — that is ALSO a dict so framework code
    (visualize.draw_boxes_mpl, existing user code) keeps working."""
    from mask_yolo_tpu.utils.host_ops import BoundBox

    # reference-style construction: classes vector, label/score derived
    bb = BoundBox(0.1, 0.2, 0.5, 0.6, c=0.9, classes=[0.0, 0.3, 0.7])
    assert bb.get_label() == 2
    assert bb.get_score() == pytest.approx(0.7)
    assert bb.xmin == pytest.approx(0.1) and bb.ymax == pytest.approx(0.6)
    assert bb.c == pytest.approx(0.9)
    assert bb["label"] == 2 and bb["score"] == pytest.approx(0.7)
    assert isinstance(bb, dict)

    # device-style construction: winning class already resolved on-chip
    bb2 = BoundBox(xmin=1, ymin=2, xmax=3, ymax=4, score=0.8, label=5)
    assert bb2.get_label() == 5 and bb2.get_score() == pytest.approx(0.8)
    assert bb2.classes is None

    # the host decoder returns BoundBox too (oracle + API parity in one)
    rng = np.random.RandomState(0)
    netout = rng.randn(2, 2, 2, 5 + 3).astype(np.float32) * 2
    out = decode_one_yolo_output(netout, [0.6, 0.7, 1.2, 1.1], 3,
                                 obj_threshold=0.0)
    assert out, "threshold 0 keeps boxes"
    assert all(isinstance(b, BoundBox) for b in out)
    assert out[0].get_label() == out[0]["label"]
