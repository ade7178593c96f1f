"""Pallas TPU kernel: fused bilinear ROI crop (crop only, convs stay XLA).

XLA executes `ops/roi_align.crop_and_resize` as two chained einsums whose
[B, K, ph, W, C] intermediate round-trips HBM — at the 416²/81-class
operating point that is ~24 MB/img bf16 against a 1.4 MB feature map and
3.2 MB of crops, and the r4 stage profile priced the stage at 56 µs/img
(~34 µs of which is that intermediate's write+read at the measured HBM
rate). This kernel keeps both contractions of a ROI block inside VMEM:
per grid step it reads the image's feature map once, computes

    tmp  = concat_k(wy_k) @ fmap            (one [kb·ph, H]×[H, W·C] GEMM)
    crop_k = wx_k @ transpose(tmp_k)        (per-ROI [pw, W]×[W, ph·C])

and writes only the [kb, ph·pw, C] crops back. The interpolation matrices
are built in-kernel from the box corners exactly like
`ops/roi_align.interp_matrix` (reference semantics of
tf.image.crop_and_resize — /root/reference/myolo/model.py:299-413), and
intermediates are rounded to bf16 at the same points as the XLA quant
path so downstream int8 quantization sees near-identical values.

Measured verdict (TPU v5e, 416²/81-class, batch 128, interleaved A/B with
base re-run; docs/PERFORMANCE.md): end-to-end detect **2,523 img/s with
this kernel (k_block=4; 2,421 at 2) vs 3,299/3,302 XLA** — 24% slower.
The traffic argument held (the kernel moves ~5 MB/img vs XLA's ~28), but
the per-ROI [pool, W, C] → [W, pool·C] transpose between the two
contractions is a lane-dimension relayout, and 32 of them per image cost
Mosaic more than the saved bandwidth — the same failure mode as the fused
mask kernel (pallas_mask.py), now demonstrated on a kernel with NO conv
im2col to blame. Fourth Pallas-vs-XLA race in this repo, fourth XLA win;
the shipped crop stays `ops/roi_align.crop_and_resize`. Default-OFF knob:
`Config.QUANT_PALLAS_CROP` (correct, tested, selectable).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_mask import _interp_weights


def _crop_kernel(box_ref, fmap_ref, out_ref, *, pool: int, c: int, k: int):
    """One (image, ROI-block) per grid step.

    box_ref: [1, KP, 4] SMEM f32 normalized (x1, y1, x2, y2) — the image's
    FULL padded box list (a [1, k, 4] block would need k divisible by the
    8-row sublane tile; scalar SMEM reads are cheap, so the kernel slices
    its block by program id instead);
    fmap_ref: [1, H, W, C] VMEM bf16 (constant over the block axis);
    out_ref: [1, k, pool·pool, C] VMEM bf16.
    """
    h = fmap_ref.shape[1]
    w = fmap_ref.shape[2]
    f_flat = fmap_ref[0].reshape(h, w * c)
    base = pl.program_id(1) * k

    wys = []
    wxs = []
    for ki in range(k):
        x1 = box_ref[0, base + ki, 0]
        y1 = box_ref[0, base + ki, 1]
        x2 = box_ref[0, base + ki, 2]
        y2 = box_ref[0, base + ki, 3]
        wys.append(_interp_weights(y1, y2, h, pool).astype(jnp.bfloat16))
        wxs.append(_interp_weights(x1, x2, w, pool).astype(jnp.bfloat16))

    # stage 1, batched across the ROI block so the GEMM has kb·pool rows
    # (a per-ROI M=pool GEMM underfills the 128-row MXU tile ~9×)
    wy = jnp.concatenate(wys, axis=0)                        # [k·P, H]
    tmp = jax.lax.dot_general(
        wy, f_flat, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # [k·P, W·C]
    # bf16 rounding point matches the XLA path's first einsum output dtype
    tmp = tmp.astype(jnp.bfloat16)

    for ki in range(k):
        t = tmp[ki * pool:(ki + 1) * pool, :].reshape(pool, w, c)
        t = t.transpose(1, 0, 2).reshape(w, pool * c)
        crop = jax.lax.dot_general(
            wxs[ki], t, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # [Pq, P·C]
        crop = crop.reshape(pool, pool, c).transpose(1, 0, 2)  # [Py, Px, C]
        out_ref[0, ki] = crop.reshape(pool * pool, c).astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("pool", "k_block", "interpret"))
def crop_rois(fmap, boxes, pool: int = 14, k_block: int = 4,
              interpret: bool = False):
    """Fused bilinear crop of K ROIs per image.

    fmap: [B, H, W, C] float; boxes: [B, K, 4] normalized (x1, y1, x2, y2).
    Returns [B, K, pool, pool, C] bf16 — same layout/values (up to bf16
    accumulation rounding) as `crop_and_resize(fmap, boxes, (pool, pool),
    dtype=bf16)`.

    k_block: ROIs per grid step — compile cost is linear in the block, the
    grid is (B, ceil(K / k_block)) with the feature map VMEM-resident
    across a row's blocks. VMEM per step ≈ 2·fmap + 2·out_block +
    kb·pool·W·C·(4+2)B (the stage-1 f32 accumulator + its bf16 copy):
    kb=8 at 52²×256 measured 19.8 MB scoped (over the 16 MB limit at
    batch 128's pipelining depth); kb=4 fits.
    """
    b, h, w, c = fmap.shape
    k = boxes.shape[1]
    kb = max(1, min(int(k_block), k))
    nkb = -(-k // kb)
    kp = nkb * kb
    if kp != k:
        boxes = jnp.pad(boxes, ((0, 0), (0, kp - k), (0, 0)))

    kernel = functools.partial(_crop_kernel, pool=pool, c=c, k=kb)
    out = pl.pallas_call(
        kernel,
        grid=(b, nkb),
        in_specs=[
            pl.BlockSpec((1, kp, 4), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, h, w, c), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, kb, pool * pool, c),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, kp, pool * pool, c),
                                       jnp.bfloat16),
        interpret=interpret,
    )(boxes.astype(jnp.float32), fmap.astype(jnp.bfloat16))
    return out[:, :k].reshape(b, k, pool, pool, c)
