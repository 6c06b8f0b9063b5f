"""Zip-archive image reader (reference lib/utils/zipreader.py [H]).

H36M images ship as per-subject zips; paths look like
``S1.zip@/S1/Images/....jpg``. A per-process handle cache avoids reopening
archives; decode goes through cv2 (BGR, like the reference) unless
``rgb=True``.
"""

from __future__ import annotations

import os
import threading
import zipfile

import numpy as np

_cache: dict[str, zipfile.ZipFile] = {}
_lock = threading.Lock()


def split_zip_path(path: str) -> tuple[str, str]:
    """'a.zip@/inner.jpg' -> ('a.zip', 'inner.jpg')."""
    if "@" not in path:
        raise ValueError(f"not a zip path: {path}")
    zip_path, inner = path.split("@", 1)
    return zip_path, inner.lstrip("/")


def is_zip_path(path: str) -> bool:
    return ".zip@" in path


def _handle(zip_path: str) -> zipfile.ZipFile:
    key = f"{os.getpid()}:{zip_path}"
    with _lock:
        zf = _cache.get(key)
        if zf is None:
            zf = zipfile.ZipFile(zip_path, "r")
            _cache[key] = zf
        return zf


def read_bytes(path: str) -> bytes:
    zip_path, inner = split_zip_path(path)
    return _handle(zip_path).read(inner)


def read_file_bytes(path: str) -> bytes:
    """Raw bytes from a plain path or a ``zip@/inner`` path (the shared
    JPEG-fetch helper of the native-loader fast paths)."""
    if is_zip_path(path):
        return read_bytes(path)
    with open(path, "rb") as f:
        return f.read()


def imread(path: str, rgb: bool = False) -> np.ndarray:
    """Read an image from a plain path or a ``zip@/inner`` path."""
    import cv2
    if is_zip_path(path):
        buf = np.frombuffer(read_bytes(path), np.uint8)
        img = cv2.imdecode(buf, cv2.IMREAD_COLOR)
    else:
        img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise IOError(f"failed to read image: {path}")
    if rgb:
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    return img
