"""Test environment: force CPU with 8 virtual devices so multi-chip sharding
paths compile and execute without TPU hardware (SURVEY.md §4)."""

import os

# Force CPU. NOTE: this sandbox pre-imports jax (sitecustomize) with
# jax_platforms="axon,cpu" (the real TPU tunnel), so setting JAX_PLATFORMS /
# XLA_FLAGS env vars here is too late — override via jax.config instead.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compilation cache: the suite compiles many small XLA programs;
# caching them across runs cuts wall-clock dramatically.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np
import pytest

from mask_yolo_tpu.config import Config


class TinyConfig(Config):
    """Small operating point for fast CPU tests: 64² images, 2×2 grid."""

    NAME = "tiny"
    LABELS = ["background", "a", "b"]
    NUM_CLASSES = 3
    IMAGE_SHAPE = [64, 64, 3]
    IMAGE_MIN_DIM = 64
    IMAGE_MAX_DIM = 64
    GRID_H, GRID_W = 2, 2
    N_BOX = 2
    ANCHORS = [0.6, 0.7, 1.2, 1.1]
    TRUE_BOX_BUFFER = 4
    MAX_GT_INSTANCES = 4
    TRAIN_ROIS_PER_IMAGE = 2 * 2 * 2
    MASK_POOL_SIZE = 4
    MASK_SHAPE = [8, 8]
    TOP_FEATURE_MAP_DEPTH = 16
    BATCH_SIZE = 2
    TRAIN_BN = True
    DETECTION_MAX_INSTANCES = 4


@pytest.fixture(scope="session")
def tiny_config():
    return TinyConfig()


@pytest.fixture(scope="module")
def rng():
    # Module-scoped on purpose: a session-scoped stream couples every
    # downstream test's random inputs to suite ORDER — adding a test in one
    # file re-rolls the draws for every file after it, tripping
    # tolerance-marginal parity tests (observed r5: test_pallas_ds /
    # test_quant failed in-suite, passed in isolation). A fresh stream per
    # module keeps inputs deterministic and order-independent across files.
    return np.random.RandomState(42)
