"""Probe: does jax's persistent compilation cache work through the axon
tunnel backend? Run this twice (two processes); if the second process's
compile() of the same meaty program is ~seconds instead of ~minutes, the
cache works and the segmented trainer should enable it.

Usage: python tools/probe_compile_cache.py [label]
"""
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

label = sys.argv[1] if len(sys.argv) > 1 else "?"
print(f"[{label}] devices: {jax.devices()}", flush=True)

# warm the backend with a trivial op so compile timing below excludes
# tunnel/backend initialization
t0 = time.time()
y = jnp.add(jnp.ones((4,)), 1.0)
_ = jax.device_get(y)
print(f"[{label}] backend init + trivial op: {time.time() - t0:.1f}s",
      flush=True)

key = jax.random.PRNGKey(0)
w = jax.random.normal(key, (3, 3, 64, 64), jnp.bfloat16) * 0.05


def block(x, _):
    x = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jnp.tanh(x), ()


def f(x):
    x, _ = jax.lax.scan(block, x, None, length=40)
    return jnp.sum(x.astype(jnp.float32))


x = jnp.ones((8, 64, 64, 64), jnp.bfloat16)
t0 = time.time()
lowered = jax.jit(f).lower(x)
print(f"[{label}] lower: {time.time() - t0:.1f}s", flush=True)
t0 = time.time()
compiled = lowered.compile()
dt = time.time() - t0
print(f"[{label}] compile: {dt:.1f}s", flush=True)
t0 = time.time()
out = jax.device_get(compiled(x))
print(f"[{label}] run: {time.time() - t0:.1f}s out={out}", flush=True)
