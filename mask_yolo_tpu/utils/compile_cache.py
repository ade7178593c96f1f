"""Persistent XLA compilation cache for TPU entry points.

The segmented quality-run supervisor (tools/quality_run_coco.py) restarts
the trainer as a fresh process every N epochs to bound host RSS on runners
whose device-transfer layer leaks per upload. Each child used to re-pay the
full scan-program compile (~35 min through the RPC tunnel). jax's
persistent compilation cache works through the axon tunnel backend
(measured: second-process compile of an identical program 0.0s vs 1.7s —
tools/probe_compile_cache.py), so every TPU tool enables it here and only
the first segment pays the compile.

Not used by tests: tests/conftest.py pins its own CPU cache at
/tmp/jax_test_cache. Cache keys include platform/topology, so mixed CPU
and TPU entries in one directory would be correct anyway.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_tpu_cache")


def enable(path: str | None = None) -> str:
    """Point jax's persistent compilation cache at ``path`` (default:
    ``<repo>/.jax_tpu_cache``, overridable via $MASK_YOLO_TPU_COMPILE_CACHE)
    and cache every compile regardless of duration."""
    import jax

    path = path or os.environ.get("MASK_YOLO_TPU_COMPILE_CACHE", _DEFAULT)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return path
