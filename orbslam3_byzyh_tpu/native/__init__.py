"""Native (C++) runtime components with lazy self-build + ctypes bindings.

The compute path is JAX/XLA/Pallas; the host runtime around it (data
loading/decode, queueing) is C++ — mirroring where the reference spends
native code (its whole runtime is C++). Falls back to pure-Python
implementations when a toolchain isn't available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libslamnative.so")
_SRC = [os.path.join(_DIR, "prefetcher.cpp")]


def _build() -> bool:
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
        "-I/usr/include/opencv4",
        *_SRC, "-o", _SO,
        "-lopencv_core", "-lopencv_imgcodecs", "-lopencv_imgproc",
        "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired):
        return False


_lib = None


def load() -> ctypes.CDLL | None:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or any(
            os.path.getmtime(s) > os.path.getmtime(_SO) for s in _SRC):
        if not _build():
            return None
    lib = ctypes.CDLL(_SO)
    lib.pf_create.restype = ctypes.c_void_p
    lib.pf_create.argtypes = [ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                              ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.pf_next.restype = ctypes.c_int
    lib.pf_next.argtypes = [ctypes.c_void_p,
                            ctypes.POINTER(ctypes.c_float),
                            ctypes.c_longlong,
                            ctypes.POINTER(ctypes.c_int),
                            ctypes.POINTER(ctypes.c_int)]
    lib.pf_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class ImagePrefetcher:
    """Ordered multithreaded image loader. Iterate to get (idx, ndarray)."""

    def __init__(self, paths, n_threads: int = 4, capacity: int = 8,
                 max_hw=(1536, 2048)):
        import numpy as np

        self._np = np
        self._paths = list(paths)
        self._lib = load()
        self._max_elems = max_hw[0] * max_hw[1]
        if self._lib is not None:
            arr = (ctypes.c_char_p * len(self._paths))(
                *[p.encode() for p in self._paths])
            self._handle = self._lib.pf_create(
                arr, len(self._paths), n_threads, capacity, 1)
            self._buf = np.empty(self._max_elems, np.float32)
        else:
            self._handle = None
            self._pos = 0

    def __iter__(self):
        return self

    def __next__(self):
        np = self._np
        if self._handle is not None:
            h = ctypes.c_int()
            w = ctypes.c_int()
            idx = self._lib.pf_next(
                self._handle,
                self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                self._max_elems, ctypes.byref(h), ctypes.byref(w))
            if idx == -1:
                raise StopIteration
            if idx == -2:
                raise IOError("image decode failed or image too large")
            img = self._buf[: h.value * w.value].reshape(
                h.value, w.value).copy()
            return idx, img
        # Fallback: synchronous cv2.
        import cv2
        if self._pos >= len(self._paths):
            raise StopIteration
        i = self._pos
        self._pos += 1
        img = cv2.imread(self._paths[i], cv2.IMREAD_GRAYSCALE)
        if img is None:
            raise IOError(self._paths[i])
        return i, img.astype(np.float32)

    def close(self):
        if getattr(self, "_handle", None) is not None and self._lib is not None:
            self._lib.pf_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
