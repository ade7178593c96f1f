"""Checkpoint round-trip + by_name/exclude subtree loading."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mask_yolo_tpu.train import state as state_lib


@pytest.fixture()
def small_params(rng):
    return {
        "backbone": {"conv1": {"kernel": jnp.asarray(rng.randn(3, 3, 3, 8),
                                                     jnp.float32)}},
        "yolo": {"conv_23": {"kernel": jnp.asarray(rng.randn(1, 1, 8, 4),
                                                   jnp.float32),
                 "bias": jnp.zeros((4,), jnp.float32)}},
        "mask": {"mask_conv1": {"kernel": jnp.asarray(rng.randn(3, 3, 8, 8),
                                                      jnp.float32)}},
    }


def test_save_load_roundtrip(tmp_path, small_params):
    tx = optax.adam(1e-3)
    st = state_lib.create_train_state(small_params, {}, tx)
    path = os.path.join(tmp_path, "ckpt")
    state_lib.save_checkpoint(path, st, epoch=3)
    loaded = state_lib.load_checkpoint(path)
    assert loaded["epoch"] == 3
    for a, b in zip(jax.tree.leaves(small_params),
                    jax.tree.leaves(loaded["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_merge_by_name_and_exclude(small_params, rng):
    other = jax.tree.map(lambda x: x + 1.0, small_params)
    merged = state_lib.merge_params(small_params, other, by_name=True,
                                    exclude=["mask"])
    # backbone/yolo replaced, mask kept
    np.testing.assert_array_equal(
        np.asarray(merged["backbone"]["conv1"]["kernel"]),
        np.asarray(other["backbone"]["conv1"]["kernel"]))
    np.testing.assert_array_equal(
        np.asarray(merged["mask"]["mask_conv1"]["kernel"]),
        np.asarray(small_params["mask"]["mask_conv1"]["kernel"]))


def test_merge_by_name_skips_unknown(small_params):
    loaded = {"backbone": small_params["backbone"], "unknown_module": {"w": jnp.ones(3)}}
    merged = state_lib.merge_params(small_params, loaded, by_name=True)
    assert "unknown_module" not in merged
    assert set(merged.keys()) == {"backbone", "yolo", "mask"}


def test_maskyolo_save_load(tmp_path):
    from conftest import TinyConfig
    from mask_yolo_tpu.model import MaskYOLO

    m = MaskYOLO(mode="inference", config=TinyConfig(), seed=0)
    path = os.path.join(tmp_path, "w")
    m.save_weights(path)

    m2 = MaskYOLO(mode="inference", config=TinyConfig(), seed=1)
    # different seeds → different params
    a = jax.tree.leaves(m.params)[0]
    b = jax.tree.leaves(m2.params)[0]
    assert not np.array_equal(np.asarray(a), np.asarray(b))
    m2.load_weights(path)
    for x, y in zip(jax.tree.leaves(m.params), jax.tree.leaves(m2.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
