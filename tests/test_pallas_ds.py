"""Fused DW+PW Pallas block (ops/pallas_ds.py) vs the chained XLA int8 path
— interpret mode on CPU; integer arithmetic must agree EXACTLY."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mask_yolo_tpu import quant
from mask_yolo_tpu.ops.pallas_ds import fused_ds_block, pack_ds_pair


def _make_pair(rng, c=8, o=16, s_in=0.011, a_pw=0.017):
    """A quantized (dw, pw) Layer pair with random folded weights."""
    dwk = rng.randn(3, 3, 1, c).astype(np.float32) * 0.4
    dwb = rng.randn(c).astype(np.float32) * 0.2
    pwk = rng.randn(1, 1, c, o).astype(np.float32) * 0.3
    pwb = rng.randn(o).astype(np.float32) * 0.2
    dw = quant.Layer("dw", "dw", dwk, dwb, (1, 1), "relu6", groups=c,
                     quantize=True)
    pw = quant.Layer("pw", "conv", pwk, pwb, (1, 1), "relu6")
    dw.a_scale, pw.a_scale = s_in, a_pw
    quant.quantize_weights({"t": [dw, pw]})
    return dw, pw


@pytest.mark.parametrize("s_out", [0.05, 0.0])
def test_fused_ds_matches_chained_xla(rng, s_out):
    dw, pw = _make_pair(rng)
    b, h, w, c = 2, 8, 12, 8
    x_q = rng.randint(-127, 128, size=(b, h, w, c)).astype(np.int8)

    # chained XLA reference: dw (int8, requant at pw scale) → pw
    x1, s1 = quant.run_layer_int8(dw, jnp.asarray(x_q), dw.a_scale,
                                  out_scale=pw.a_scale)
    ref, s2 = quant.run_layer_int8(pw, x1, s1,
                                   out_scale=s_out if s_out else None)
    ref = np.asarray(ref)

    kdw, dwsb, wpw, pwsb = pack_ds_pair(dw, pw, dw.a_scale)
    got = np.asarray(fused_ds_block(
        jnp.asarray(x_q), jnp.asarray(kdw), jnp.asarray(dwsb),
        jnp.asarray(wpw), jnp.asarray(pwsb), a_pw=float(pw.a_scale),
        s_out=float(s_out), interpret=True))

    assert got.dtype == (np.int8 if s_out else np.float32)
    if s_out:
        np.testing.assert_array_equal(got, ref)
    else:
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_fused_ds_row_tiling_matches_full(rng):
    """Row-tiled grid (halo DMA) == single-tile execution, exactly."""
    dw, pw = _make_pair(rng, c=8, o=8)
    x_q = rng.randint(-127, 128, size=(1, 12, 8, 8)).astype(np.int8)
    kdw, dwsb, wpw, pwsb = pack_ds_pair(dw, pw, dw.a_scale)
    args = (jnp.asarray(x_q), jnp.asarray(kdw), jnp.asarray(dwsb),
            jnp.asarray(wpw), jnp.asarray(pwsb))
    full = np.asarray(fused_ds_block(*args, a_pw=float(pw.a_scale),
                                     s_out=0.04, interpret=True, tile_h=12))
    tiled = np.asarray(fused_ds_block(*args, a_pw=float(pw.a_scale),
                                      s_out=0.04, interpret=True, tile_h=4))
    np.testing.assert_array_equal(full, tiled)


def test_run_layers_fused_ds_end_to_end(rng):
    """run_layers(fused_ds=True) swaps eligible pairs in transparently: the
    whole segment's output must match the unfused chained execution."""
    dw1, pw1 = _make_pair(rng, c=8, o=8, s_in=0.02, a_pw=0.015)
    dw2, pw2 = _make_pair(rng, c=8, o=16, s_in=0.04, a_pw=0.018)
    dw1.name, pw1.name, dw2.name, pw2.name = "b1/dw", "b1/pw", "b2/dw", "b2/pw"
    head = quant.Layer("head", "conv",
                       rng.randn(1, 1, 8, 8).astype(np.float32) * 0.3,
                       np.zeros(8, np.float32), (2, 2), "relu6")
    head.a_scale = 0.01
    tail = quant.Layer("tail", "conv",
                       rng.randn(1, 1, 16, 4).astype(np.float32) * 0.3,
                       np.zeros(4, np.float32), (1, 1), "linear")
    tail.a_scale = 0.03
    layers = [head, dw1, pw1, dw2, pw2, tail]
    quant.quantize_weights({"t": layers})

    x = rng.rand(2, 16, 16, 8).astype(np.float32)
    ref = np.asarray(quant.run_layers(layers, jnp.asarray(x), quant=True))
    got = np.asarray(quant.run_layers(layers, jnp.asarray(x), quant=True,
                                      fused_ds=True, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_fused_ds_skips_stride2(rng):
    """Stride-2 DW blocks must NOT fuse (the kernel is stride-1 only)."""
    dw, pw = _make_pair(rng)
    dw.strides = (2, 2)
    assert not quant._fusable_ds_pair(dw, pw, 0.01)
    dw.strides = (1, 1)
    assert quant._fusable_ds_pair(dw, pw, 0.01)
    assert not quant._fusable_ds_pair(dw, pw, None)  # f32 input → no fuse
