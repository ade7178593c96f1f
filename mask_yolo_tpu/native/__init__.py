"""Native (C++) host-side kernels for the data pipeline.

Builds `image_ops.cpp` with g++ on first import into a content-hash-cached
shared library and binds it through ctypes (foreign calls release the GIL,
so a thread-pooled loader parallelizes for real). Everything degrades
gracefully: if no compiler is available or the build fails, `LIB is None`
and callers (utils/image.py) keep using their numpy implementations.

Set MASK_YOLO_TPU_NATIVE=0 to force the numpy path (used by the golden
tests to compare both).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "image_ops.cpp")

LIB = None


def _build_and_load():
    """Compile (if not cached) and dlopen the kernels; None on any failure."""
    if os.environ.get("MASK_YOLO_TPU_NATIVE", "1") == "0":
        return None
    try:
        with open(_SRC, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
        cache_dir = os.path.join(tempfile.gettempdir(), "mask_yolo_tpu_native")
        os.makedirs(cache_dir, exist_ok=True)
        so_path = os.path.join(cache_dir, f"image_ops_{digest}.so")
        if not os.path.exists(so_path):
            tmp = so_path + f".tmp{os.getpid()}"
            subprocess.run(
                # -ffp-contract=off: no FMA contraction, so the float lerp
                # rounds exactly like the numpy reference (bitwise parity)
                ["g++", "-O3", "-march=native", "-ffp-contract=off",
                 "-shared", "-fPIC", "-o", tmp, _SRC],
                check=True, capture_output=True, timeout=120)
            os.replace(tmp, so_path)  # atomic: concurrent builders race safely
        lib = ctypes.CDLL(so_path)
    except Exception:
        return None

    i64 = ctypes.c_int64
    lib.resize_bilinear_f32.argtypes = [
        ctypes.POINTER(ctypes.c_float), i64, i64, i64,
        ctypes.POINTER(ctypes.c_float), i64, i64, ctypes.c_int]
    lib.resize_bilinear_f32.restype = None
    lib.resize_nearest_bytes.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), i64, i64, i64,
        ctypes.POINTER(ctypes.c_uint8), i64, i64]
    lib.resize_nearest_bytes.restype = None
    lib.polygon_mask_u8.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double), i64,
        ctypes.POINTER(ctypes.c_uint8), i64, i64]
    lib.polygon_mask_u8.restype = None
    lib.circle_mask_u8.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), i64, i64, i64, i64, i64]
    lib.circle_mask_u8.restype = None
    return lib


LIB = _build_and_load()


def available() -> bool:
    return LIB is not None


def _fptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def resize_bilinear_f32(image: np.ndarray, out_h: int, out_w: int,
                        align_corners: bool = False) -> np.ndarray:
    """[H, W, C] any-dtype → [out_h, out_w, C] float32."""
    img = np.ascontiguousarray(image, dtype=np.float32)
    h, w, c = img.shape
    out = np.empty((out_h, out_w, c), np.float32)
    LIB.resize_bilinear_f32(_fptr(img, ctypes.c_float), h, w, c,
                            _fptr(out, ctypes.c_float), out_h, out_w,
                            int(align_corners))
    return out


def resize_nearest(mask: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """[H, W] or [H, W, N] any-dtype nearest resize (dtype preserved)."""
    m = np.ascontiguousarray(mask)
    squeeze = m.ndim == 2
    if squeeze:
        m = m[:, :, None]
    h, w, n = m.shape
    c_bytes = n * m.itemsize
    out = np.empty((out_h, out_w, n), m.dtype)
    LIB.resize_nearest_bytes(
        _fptr(m.view(np.uint8), ctypes.c_uint8), h, w, c_bytes,
        _fptr(out.view(np.uint8), ctypes.c_uint8), out_h, out_w)
    return out[:, :, 0] if squeeze else out


def polygon_mask(xs, ys, shape) -> np.ndarray:
    """Boolean even-odd polygon mask (same contract as
    utils.image.polygon_mask)."""
    h, w = int(shape[0]), int(shape[1])
    xs = np.ascontiguousarray(xs, dtype=np.float64)
    ys = np.ascontiguousarray(ys, dtype=np.float64)
    out = np.empty((h, w), np.uint8)
    LIB.polygon_mask_u8(_fptr(xs, ctypes.c_double), _fptr(ys, ctypes.c_double),
                        len(xs), _fptr(out, ctypes.c_uint8), h, w)
    return out.astype(bool)


def circle_mask(shape, cx: int, cy: int, radius: int) -> np.ndarray:
    """Boolean filled-circle mask (inclusive radius, pixel centers)."""
    h, w = int(shape[0]), int(shape[1])
    out = np.zeros((h, w), np.uint8)
    LIB.circle_mask_u8(_fptr(out, ctypes.c_uint8), h, w,
                       int(cx), int(cy), int(radius))
    return out.astype(bool)
