"""ctypes binding for the native batch loader (native/fastloader.cpp).

Builds the shared library on first use (g++; cached next to the source) and
falls back gracefully — callers must check :func:`available` or catch
RuntimeError. One native call per BATCH: fused JPEG decode + bilinear affine
warp + float conversion across an OpenMP thread pool, replacing per-sample
cv2 work in Python threads (the reference's DataLoader-worker equivalent).
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import threading

import numpy as np

_lib = None
_lock = threading.Lock()
_NATIVE_DIR = pathlib.Path(__file__).resolve().parents[2] / "native"


def _build() -> pathlib.Path:
    so = _NATIVE_DIR / "libfastloader.so"
    src = _NATIVE_DIR / "fastloader.cpp"
    if so.exists() and so.stat().st_mtime >= src.stat().st_mtime:
        return so
    subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                   capture_output=True)
    return so


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        so = _build()
        lib = ctypes.CDLL(str(so))
        lib.decode_warp_batch.restype = ctypes.c_int
        lib.decode_warp_batch.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_float,
        ]
        lib.decode_warp_batch_u8.restype = ctypes.c_int
        lib.decode_warp_batch_u8.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.warp_batch_u8.restype = None
        lib.warp_batch_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_float,
        ]
        lib.decode_warp2_batch_u8.restype = ctypes.c_int
        lib.decode_warp2_batch_u8.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.decode_warp2_sized_batch_u8.restype = ctypes.c_int
        lib.decode_warp2_sized_batch_u8.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8),
        ]
        _lib = lib
        return lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def _jpeg_ptrs(jpeg_buffers: list[bytes]):
    """Pointer/size arrays aliasing the bytes objects directly — the C
    side only reads, and the caller's list keeps the bytes alive, so the
    per-batch create_string_buffer memcpy of every JPEG is avoidable."""
    n = len(jpeg_buffers)
    ptrs = ctypes.cast((ctypes.c_char_p * n)(*jpeg_buffers),
                       ctypes.POINTER(ctypes.c_void_p))
    sizes = (ctypes.c_size_t * n)(*[len(b) for b in jpeg_buffers])
    return ptrs, sizes


def decode_warp_batch(jpeg_buffers: list[bytes], Ms: np.ndarray,
                      output_size: tuple[int, int],
                      scale: float = 1.0 / 255.0,
                      dtype=np.uint8) -> np.ndarray:
    """Fused decode+warp. Ms: (N, 2, 3) src->dst affines; output (W, H).

    dtype=np.uint8 (default): (N, H, W, 3) uint8 crops — 4x fewer bytes on
    the host->device path; normalization (incl. /255) happens inside the
    jitted step. dtype=np.float32: [0, scale*255] floats (legacy path).
    Failed decodes come back as zero images (a black frame rather than a
    crashed epoch).
    """
    lib = _load()
    n = len(jpeg_buffers)
    W, H = int(output_size[0]), int(output_size[1])
    ptrs, sizes = _jpeg_ptrs(jpeg_buffers)
    Ms = np.ascontiguousarray(Ms, np.float32).reshape(n, 6)
    Mp = Ms.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    if np.dtype(dtype) == np.uint8:
        out = np.empty((n, H, W, 3), np.uint8)
        lib.decode_warp_batch_u8(
            ptrs, sizes, n, Mp, W, H,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return out
    out = np.empty((n, H, W, 3), np.float32)
    lib.decode_warp_batch(
        ptrs, sizes, n, Mp, W, H,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_float(scale))
    return out


def decode_warp2_batch(jpeg_buffers: list[bytes], Ms1: np.ndarray,
                       Ms2: np.ndarray, output_size: tuple[int, int],
                       output_size1: tuple[int, int] | None = None):
    """Decode each JPEG once, warp through TWO affines -> two uint8 crops.

    The self-supervised dual-crop path: clean teacher crop (Ms1) +
    augmented student crop (Ms2) share one decode. Returns (crops1, crops2),
    (N, H, W, 3) uint8 each. ``output_size1`` overrides crop 1's size (the
    half-res teacher crop: Ms1 must already map into that smaller frame).
    """
    lib = _load()
    n = len(jpeg_buffers)
    W2, H2 = int(output_size[0]), int(output_size[1])
    W1, H1 = (W2, H2) if output_size1 is None else \
        (int(output_size1[0]), int(output_size1[1]))
    ptrs, sizes = _jpeg_ptrs(jpeg_buffers)
    Ms1 = np.ascontiguousarray(Ms1, np.float32).reshape(n, 6)
    Ms2 = np.ascontiguousarray(Ms2, np.float32).reshape(n, 6)
    out1 = np.empty((n, H1, W1, 3), np.uint8)
    out2 = np.empty((n, H2, W2, 3), np.uint8)
    lib.decode_warp2_sized_batch_u8(
        ptrs, sizes, n,
        Ms1.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        Ms2.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        W1, H1, W2, H2,
        out1.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out2.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out1, out2


def warp_batch(images_u8: np.ndarray, Ms: np.ndarray,
               output_size: tuple[int, int],
               scale: float = 1.0 / 255.0) -> np.ndarray:
    """Batch warp of same-size uint8 RGB images. images: (N, H, W, 3)."""
    lib = _load()
    images_u8 = np.ascontiguousarray(images_u8, np.uint8)
    n, sh, sw, _ = images_u8.shape
    W, H = int(output_size[0]), int(output_size[1])
    Ms = np.ascontiguousarray(Ms, np.float32).reshape(n, 6)
    out = np.empty((n, H, W, 3), np.float32)
    lib.warp_batch_u8(
        images_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, sw, sh,
        Ms.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        W, H,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_float(scale))
    return out
