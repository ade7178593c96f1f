"""Variant probes for the 416² trunk layers the per-layer roofline flagged
(tools/profile_layers_416.py, r4): the stem conv (38% of its same-shape GEMM)
and the stride-2 depthwise convs (block7/dw measured 30× slower per FLOP than
the same-channel block13/dw).

Variants (each checked for exactness vs the shipped formulation first, then
delta-timed with the bench.py harness):

  conv1:
    base     — int8 3×3/s2 conv as shipped
    s2d      — space-to-depth(2) input + remapped 2×2/s1 int8 kernel
               (K 27→48, unit stride; bit-exact by construction)
    bf16     — unquantized bf16 3×3/s2
  stride-2 dw (block2/dw, block7/dw):
    base     — int8 3×3/s2 grouped conv as shipped
    s1_slice — int8 3×3/s1 grouped conv + [1::2] subsample (exact)
    bf16     — bf16 3×3/s2 grouped conv

Run: python tools/probe_conv_variants.py [--batch 128]
Prints one JSON line per (layer, variant).
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _delta(call, n1, n2, reps=5):
    float(call(n1))
    float(call(n2))
    ds = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(call(n1))
        t1 = time.perf_counter()
        float(call(n2))
        t2 = time.perf_counter()
        d = (t2 - t1) - (t1 - t0)
        if d > 0:
            ds.append(d / (n2 - n1))
    if not ds:
        raise RuntimeError("non-positive deltas")  # else NaN poisons the JSON
    return float(np.median(ds))


def adaptive(make_call, t_guess, target=0.35):
    spread = int(np.clip(target / max(t_guess, 1e-7), 16, 4096))
    call = make_call()
    t = _delta(call, 4, 4 + spread, reps=2)
    want = int(np.clip(target / max(t, 1e-7), 16, 4096))
    if want > 2 * spread or want < spread // 2:
        spread = want
    return _delta(call, 4, 4 + spread, reps=5)


def make_chain(fn, x0):
    @functools.partial(jax.jit, static_argnums=(1,))
    def repeat(x, n):
        def body(carry, _):
            x, acc = carry
            y = fn(x)
            s = jnp.sum(y.astype(jnp.float32)) * jnp.float32(1e-9)
            if x.dtype == jnp.int8:
                x = jnp.clip(x.astype(jnp.int32) + (s * 0).astype(jnp.int32),
                             -127, 127).astype(jnp.int8)
            else:
                x = x + (s * jnp.float32(1e-30)).astype(x.dtype)
            return (x, acc + s), None
        (_, acc), _ = jax.lax.scan(body, (x, jnp.float32(0)), None, length=n)
        return acc

    return lambda n: repeat(x0, n)


def space_to_depth2(x):
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def remap_kernel_s2d(w):
    """[3, 3, C, O] stride-2 kernel → [2, 2, 4C, O] stride-1 kernel over the
    space-to-depth input, with SAME-s2 padding semantics (pad_low=0):
    out(i,j) = Σ_{ky,kx∈0..2} X[2i+ky, 2j+kx]·W[ky,kx]. In s2d coords
    X2[p,q,(dy,dx,c)] = X[2p+dy, 2q+dx, c], so ky = 2·py + dy."""
    kh, kw, c, o = w.shape
    assert (kh, kw) == (3, 3)
    w2 = np.zeros((2, 2, 4 * c, o), w.dtype)
    for py in range(2):
        for px in range(2):
            for dy in range(2):
                for dx in range(2):
                    ky, kx = 2 * py + dy, 2 * px + dx
                    if ky <= 2 and kx <= 2:
                        ch = (dy * 2 + dx) * c
                        w2[py, px, ch:ch + c] = w[ky, kx]
    return w2


def int8_conv(x_q, w_q, strides, groups=1, padding="SAME"):
    return jax.lax.conv_general_dilated(
        x_q, w_q, strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.int32)


def epilogue(y_i32, w_scale, s_in, bias, act, out_scale):
    y = y_i32.astype(jnp.float32) * (w_scale * np.float32(s_in)) + bias
    y = jax.nn.relu6(y) if act == "relu6" else y
    if out_scale is not None:
        inv = np.float32(1.0 / out_scale)
        y = jnp.clip(jnp.round(y * inv), -127, 127).astype(jnp.int8)
    return y


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--targets", default="conv1,block2/dw,block7/dw")
    args = ap.parse_args()

    from mask_yolo_tpu import quant
    from mask_yolo_tpu.config import CocoStyleConfig
    from mask_yolo_tpu.models.network import MaskYoloNet

    cfg = CocoStyleConfig()
    net = MaskYoloNet(num_classes=cfg.NUM_CLASSES, n_box=cfg.N_BOX,
                      top_feature_map_depth=cfg.TOP_FEATURE_MAP_DEPTH,
                      mask_pool_size=cfg.MASK_POOL_SIZE, backbone=cfg.BACKBONE,
                      compute_dtype=cfg.COMPUTE_DTYPE,
                      image_hw=tuple(cfg.IMAGE_SHAPE[:2]))
    variables = jax.jit(lambda r, i, ro: net.init(r, i, ro, train=False))(
        jax.random.PRNGKey(0),
        jnp.zeros((1, *cfg.IMAGE_SHAPE), jnp.float32),
        jnp.zeros((1, 8, 4), jnp.float32))
    calib = np.random.RandomState(1).rand(4, *cfg.IMAGE_SHAPE).astype(np.float32)
    det = quant.QuantizedDetector.from_variables(jax.device_get(variables),
                                                 cfg, calib)
    graph = det.graph
    layers = {l.name: l for part in graph.values() for l in part}

    # input shapes/scales per target (from the per-layer roofline walk)
    meta = {
        "conv1": dict(in_hw=(416, 416), cin=3, in_scale=None),
        "block2/dw": dict(in_hw=(208, 208), cin=64, in_scale="prev"),
        "block7/dw": dict(in_hw=(52, 52), cin=512, in_scale="prev"),
    }
    # successor scales (requantize target), from the chain order
    def next_scale(name):
        for part in ("trunk", "neck", "yolo"):
            ls = graph[part]
            for i, l in enumerate(ls):
                if l.name == name and i + 1 < len(ls):
                    nx = ls[i + 1]
                    return nx.a_scale if quant._scale_ok(nx.a_scale) else None
        return None

    rng = np.random.RandomState(0)
    b = args.batch
    for name in args.targets.split(","):
        name = name.strip()
        layer = layers[name]
        m = meta[name]
        hw, cin = m["in_hw"], m["cin"]
        out_scale = next_scale(name)
        if m["in_scale"] is None:
            x0 = jnp.asarray(rng.rand(b, *hw, cin).astype(np.float32))
            x_q0 = None
        else:
            x0 = None
            x_q0 = jnp.asarray(rng.randint(-127, 128, (b, *hw, cin)), jnp.int8)

        w_scale = jnp.asarray(layer.w_scale)
        bias = jnp.asarray(layer.bias)
        s_in = 1.0 if layer.act_folded else float(
            layer.a_scale if np.ndim(layer.a_scale) == 0 else 1.0)

        variants = {}

        if layer.groups == 1:  # conv1
            a_scale = layer.a_scale

            def base(x):
                y, _ = quant.run_layer_int8(layer, x, None, out_scale)
                return y

            w2 = remap_kernel_s2d(np.asarray(layer.w_q))

            def s2d(x):
                x_q = jnp.clip(jnp.round(
                    x * np.float32(1.0 / a_scale)), -127, 127).astype(jnp.int8)
                x2 = space_to_depth2(x_q)
                y = int8_conv(x2, jnp.asarray(w2), (1, 1),
                              padding=((0, 1), (0, 1)))
                return epilogue(y, w_scale, s_in, bias, layer.act, out_scale)

            kb = jnp.asarray(layer.kernel, jnp.bfloat16)

            def bf16(x):
                y = jax.lax.conv_general_dilated(
                    x.astype(jnp.bfloat16), kb, layer.strides, "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32) + bias
                y = jax.nn.relu6(y)
                inv = np.float32(1.0 / out_scale)
                return jnp.clip(jnp.round(y * inv), -127, 127).astype(jnp.int8)

            variants = {"base": base, "s2d": s2d, "bf16": bf16}
            xin = x0
        else:  # stride-2 depthwise
            g = layer.groups

            def base(x):
                y, _ = quant.run_layer_int8(layer, x, float(layer.a_scale),
                                            out_scale)
                return y

            wq = jnp.asarray(layer.w_q)

            def s1_slice(x):
                y = int8_conv(x, wq, (1, 1), groups=g)
                y = y[:, 1::2, 1::2, :]
                return epilogue(y, w_scale, float(layer.a_scale), bias,
                                layer.act, out_scale)

            kb = jnp.asarray(layer.kernel, jnp.bfloat16)

            def bf16(x):
                xb = (x.astype(jnp.float32) * np.float32(layer.a_scale)
                      ).astype(jnp.bfloat16)
                y = jax.lax.conv_general_dilated(
                    xb, kb, layer.strides, "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    feature_group_count=g,
                    preferred_element_type=jnp.float32) + bias
                y = jax.nn.relu6(y)
                inv = np.float32(1.0 / out_scale)
                return jnp.clip(jnp.round(y * inv), -127, 127).astype(jnp.int8)

            variants = {"base": base, "s1_slice": s1_slice, "bf16": bf16}
            xin = x_q0

        ref = np.asarray(jax.jit(variants["base"])(xin))
        for vname, fn in variants.items():
            got = np.asarray(jax.jit(fn)(xin))
            if vname in ("base", "s2d", "s1_slice"):
                exact = bool(np.array_equal(got, ref))
            else:  # bf16 arithmetic differs; require near-agreement
                exact = float(np.mean(got != ref)) < 0.02
            try:
                t = adaptive(lambda: make_chain(fn, xin), t_guess=2e-3)
                print(json.dumps({"layer": name, "variant": vname,
                                  "us_per_img": round(t / b * 1e6, 2),
                                  "exact": exact}), flush=True)
            except Exception as e:
                print(json.dumps({"layer": name, "variant": vname,
                                  "error": f"{type(e).__name__}: {e}"}),
                      flush=True)


if __name__ == "__main__":
    main()
