"""ctypes bridge to the native C++ prefetching scan loader (``native/``).

Builds the shared library on first use with g++ (cached next to the
source); falls back gracefully (callers catch ImportError/OSError and use
the numpy path). This plays the role of the reference's reader-side ring
buffer (``KITTIReader.cpp:51-130``), but off the main thread.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "build", "libscan_loader.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "scan_loader.cpp")

_build_lock = threading.Lock()
_lib = None


def _build() -> str:
    os.makedirs(os.path.dirname(_SO_PATH), exist_ok=True)
    src_mtime = os.path.getmtime(_SRC_PATH)
    if os.path.exists(_SO_PATH) and os.path.getmtime(_SO_PATH) >= src_mtime:
        return _SO_PATH
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread",
           _SRC_PATH, "-o", _SO_PATH]
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO_PATH


def _load():
    global _lib
    with _build_lock:
        if _lib is None:
            lib = ctypes.CDLL(_build())
            lib.scan_loader_create.restype = ctypes.c_void_p
            lib.scan_loader_create.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_int]
            lib.scan_loader_read.restype = ctypes.POINTER(ctypes.c_float)
            lib.scan_loader_read.argtypes = [
                ctypes.c_void_p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64)]
            lib.scan_loader_destroy.argtypes = [ctypes.c_void_p]
            _lib = lib
    return _lib


class NativeScanLoader:
    """Background-prefetching KITTI .bin loader."""

    def __init__(self, paths: list[str], prefetch_depth: int = 4):
        lib = _load()
        arr = (ctypes.c_char_p * len(paths))(
            *[p.encode() for p in paths])
        self._lib = lib
        self._handle = lib.scan_loader_create(arr, len(paths), prefetch_depth)
        if not self._handle:
            raise OSError("scan_loader_create failed")
        self._n = len(paths)

    def read(self, idx: int) -> tuple[np.ndarray, np.ndarray]:
        count = ctypes.c_int64()
        ptr = self._lib.scan_loader_read(self._handle, idx,
                                         ctypes.byref(count))
        if not ptr or count.value == 0:
            raise IOError(f"native read failed for scan {idx}")
        flat = np.ctypeslib.as_array(ptr, shape=(count.value,))
        pts = flat.reshape(-1, 4).copy()  # copy out of the ring slot
        rem = pts[:, 3].copy()
        m = rem.max()
        if m > 0:
            rem /= m
        return np.ascontiguousarray(pts[:, :3]), rem

    def __len__(self) -> int:
        return self._n

    def close(self) -> None:
        if getattr(self, "_handle", None):
            self._lib.scan_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
