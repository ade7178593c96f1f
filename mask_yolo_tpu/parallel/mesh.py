"""Device mesh + sharding policy.

The reference is strictly single-process/single-device (GPU_COUNT=0,
/root/reference/myolo/config.py:47; SURVEY.md §2.3 documents the absence of
any parallelism or collectives). The TPU-native replacement is the standard
JAX recipe: build a `Mesh` over the available chips, annotate array shardings
with `NamedSharding`, and let XLA insert the collectives (psum for gradient
reduction under `jit`) over ICI.

Axes:
  'data'  — batch dimension (pure DP; gradients all-reduced by XLA)
  'model' — reserved for tensor-parallel sharding of wide channels; at this
            model scale it is 1 by default, but the train/infer steps accept
            any (data, model) factorization so pods can be expressed.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def build_mesh(config=None, devices=None) -> Mesh:
    """Build a (data, model) mesh. DATA_PARALLEL=0 means 'all devices / MP'."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    mp = int(getattr(config, "MODEL_PARALLEL", 1) or 1) if config is not None else 1
    dp = int(getattr(config, "DATA_PARALLEL", 0) or 0) if config is not None else 0
    if dp == 0:
        dp = n // mp
    assert dp * mp == n, f"mesh {dp}x{mp} != {n} devices"
    dev_array = np.asarray(devices).reshape(dp, mp)
    return Mesh(dev_array, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the 'data' mesh axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch dict onto the mesh, batch-axis sharded."""
    sh = batch_sharding(mesh)
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def replicate_tree(tree, mesh: Mesh):
    """Replicate a pytree (params / optimizer state) across the mesh."""
    sh = replicated(mesh)
    return jax.device_put(tree, sh)
