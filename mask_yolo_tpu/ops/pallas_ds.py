"""Pallas TPU kernel: fused depthwise-separable block (int8).

Targets the 416² int8 trunk's stride-1 MobileNet blocks, which are
bandwidth/VPU-bound: XLA executes depthwise-3×3 and pointwise-1×1 as two
convs with the depthwise output round-tripping through HBM
(docs/PERFORMANCE.md "Known remaining headroom" estimated ~10% of trunk
time in those round-trips at 416²). This kernel keeps the depthwise result
in VMEM:

  * grid = (batch, row-tiles). Halo handling uses THREE row-shifted views
    of the zero-ring-padded input (rows r-1 / r / r+1), sliced out in XLA —
    standard pipelined BlockSpecs, no manual DMA. (A first version DMA'd a
    [TH+2, W+2, C] halo window from an ANY-space ref; Mosaic rejects such
    copies unless the sliced sublane extent is 8-aligned — W+2 = 210 at
    416² — so the shifted-views formulation is the robust one.)
  * the 3×3 depthwise conv is nine shifted int8·int8 multiply-accumulates
    in int32 on the VPU — bit-identical to XLA's grouped int8 conv
    (integer arithmetic is order-exact);
  * dequant → bias → relu6 → requant at the pointwise layer's calibrated
    scale, all in registers;
  * the pointwise conv is one [TH·W, C] × [C, O] int8 MXU matmul with int32
    accumulation and the standard quant.py epilogue;
  * only the final int8 (or f32, for segment-final blocks) tile is written
    back.

Scales/zero-points follow quant.py exactly (symmetric per-channel weights,
per-tensor activations), so outputs match the chained XLA int8 path
bit-for-bit (tests/test_pallas_ds.py asserts exact equality).

Rebuilds the compute of keras_applications' _depthwise_conv_block as used by
the reference backbone (/root/reference/myolo/model.py:19, 55-79, 249-268).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ds_kernel(x_top, x_mid, x_bot, kdw_ref, dwsc_ref, wpw_ref, pwsc_ref,
               out_ref, *, th: int, w: int, c: int, o: int,
               inv_a_pw: float, inv_s_out: float):
    """One (image, row-tile) step.

    x_top/x_mid/x_bot: [1, TH, W+2, C] int8 — rows r-1 / r / r+1 of the
    padded input for each output row r of this tile. dwsc_ref: [2, C] f32
    (w_scale·s_in, bias); pwsc_ref: [2, O] f32 (w_scale·a_pw, bias).
    out block: [1, TH, W, O].
    """
    rows = (x_top, x_mid, x_bot)
    acc = jnp.zeros((th, w, c), jnp.int32)
    for di in range(3):
        xi = rows[di][0].astype(jnp.int32)  # [TH, W+2, C]
        for dj in range(3):
            tap = kdw_ref[di * 3 + dj, :].astype(jnp.int32)  # [C]
            acc = acc + xi[:, dj:dj + w, :] * tap

    y = acc.astype(jnp.float32) * dwsc_ref[0, :] + dwsc_ref[1, :]
    y = jnp.clip(y, 0.0, 6.0)  # relu6
    q = jnp.clip(jnp.round(y * inv_a_pw), -127, 127).astype(jnp.int8)
    q = q.reshape(th * w, c)

    acc2 = jax.lax.dot_general(
        q, wpw_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)                    # [TH·W, O]
    y2 = acc2.astype(jnp.float32) * pwsc_ref[0, :] + pwsc_ref[1, :]
    y2 = jnp.clip(y2, 0.0, 6.0)
    if inv_s_out:
        out_ref[0] = jnp.clip(jnp.round(y2 * inv_s_out), -127,
                              127).astype(jnp.int8).reshape(th, w, o)
    else:
        out_ref[0] = y2.reshape(th, w, o)


def _pick_tile(h: int, w: int, c: int) -> int:
    """Largest divisor of H whose int32 accumulator tile stays ≤ ~2 MB."""
    budget = 2 * 1024 * 1024
    best = 1
    for th in range(1, h + 1):
        if h % th == 0 and th * w * c * 4 <= budget:
            best = th
    return best


@functools.partial(jax.jit, static_argnames=("a_pw", "s_out", "interpret",
                                              "tile_h"))
def fused_ds_block(x_q, kdw_q, dw_scale_bias, wpw_q, pw_scale_bias,
                   a_pw: float, s_out: float = 0.0,
                   interpret: bool = False, tile_h: int | None = None):
    """Fused stride-1 depthwise-separable block, int8 in / int8-or-f32 out.

    x_q: [B, H, W, C] int8 at the depthwise layer's input scale (already
      folded into dw_scale_bias[0]).
    kdw_q: [9, C] int8 depthwise taps (rows = (di, dj)).
    dw_scale_bias: [2, C] f32 — row 0 = dw.w_scale · s_in, row 1 = dw.bias.
    wpw_q: [C, O] int8 pointwise weights.
    pw_scale_bias: [2, O] f32 — row 0 = pw.w_scale · a_pw, row 1 = pw.bias.
    a_pw: pointwise input activation scale (requant divisor after the DW).
    s_out: output requant scale (0.0 → f32 output for segment-final blocks).

    Returns [B, H, W, O] int8 (s_out > 0) or f32.
    """
    b, h, w, c = x_q.shape
    o = wpw_q.shape[-1]
    # zero ring + three row-shifted views (see module docstring)
    x_pad = jnp.pad(x_q, ((0, 0), (1, 1), (1, 1), (0, 0)))
    x_top = x_pad[:, 0:h]
    x_mid = x_pad[:, 1:h + 1]
    x_bot = x_pad[:, 2:h + 2]

    th = int(tile_h) if tile_h else _pick_tile(h, w, c)
    n_tiles = h // th
    out_dtype = jnp.int8 if s_out else jnp.float32

    kernel = functools.partial(
        _ds_kernel, th=th, w=w, c=c, o=o,
        inv_a_pw=float(1.0 / a_pw),
        inv_s_out=float(1.0 / s_out) if s_out else 0.0)

    row_spec = pl.BlockSpec((1, th, w + 2, c), lambda i, t: (i, t, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[
            row_spec, row_spec, row_spec,
            pl.BlockSpec((9, c), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, c), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, o), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, o), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w, o), lambda i, t: (i, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, o), out_dtype),
        interpret=interpret,
    )(x_top, x_mid, x_bot, kdw_q, dw_scale_bias, wpw_q, pw_scale_bias)


def pack_ds_pair(dw_layer, pw_layer, s_in: float):
    """quant.py Layer pair → kernel operand arrays.

    dw_layer/pw_layer: quantized Layers (w_q/w_scale set, dw grouped
    [3, 3, 1, C]); s_in: the int8 input's activation scale (dw.a_scale in
    chained execution). Returns (kdw_q, dw_scale_bias, wpw_q, pw_scale_bias).
    """
    assert dw_layer.kind == "dw" and dw_layer.strides == (1, 1)
    assert dw_layer.quantize and dw_layer.w_q is not None
    assert pw_layer.kind == "conv" and pw_layer.w_q is not None
    assert dw_layer.act == "relu6" and pw_layer.act == "relu6"
    c = dw_layer.w_q.shape[-1]
    kdw = np.asarray(dw_layer.w_q).reshape(9, c)
    dwsb = np.stack([np.asarray(dw_layer.w_scale, np.float32) * s_in,
                     np.asarray(dw_layer.bias, np.float32)])
    wpw = np.asarray(pw_layer.w_q).reshape(c, -1)
    pwsb = np.stack([
        np.asarray(pw_layer.w_scale, np.float32) * pw_layer.a_scale,
        np.asarray(pw_layer.bias, np.float32)])
    return kdw, dwsb, wpw, pwsb
