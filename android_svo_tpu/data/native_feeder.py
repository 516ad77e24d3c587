"""ctypes bindings for the native (C++) frame feeder — threaded PNG/PGM
decode + bounded prefetch ring (see native/frame_feeder.cpp).  This is the
runtime role the reference fills with its camera-thread + condvar queue
(`svo_system.cpp:33-73`); for dataset replay it keeps the accelerator fed
without Python-side decode stalls.

Falls back to building the library on first use (g++ is in the image); if
the build fails, callers should fall back to the pure-Python loaders.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libsvo_native.so")

_lib = None


def _load_library():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    lib.ff_create.restype = ctypes.c_void_p
    lib.ff_create.argtypes = [ctypes.POINTER(ctypes.c_char_p),
                              ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.ff_next.restype = ctypes.c_int
    lib.ff_next.argtypes = [ctypes.c_void_p,
                            ctypes.POINTER(ctypes.c_float),
                            ctypes.c_int, ctypes.c_int]
    lib.ff_count.restype = ctypes.c_int
    lib.ff_count.argtypes = [ctypes.c_void_p]
    lib.ff_dims.restype = ctypes.c_int
    lib.ff_dims.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
                            ctypes.POINTER(ctypes.c_int)]
    lib.ff_destroy.argtypes = [ctypes.c_void_p]
    lib.ff_decode_file.restype = ctypes.c_int
    lib.ff_decode_file.argtypes = [ctypes.c_char_p,
                                   ctypes.POINTER(ctypes.c_float),
                                   ctypes.c_int,
                                   ctypes.POINTER(ctypes.c_int),
                                   ctypes.POINTER(ctypes.c_int)]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load_library()
        return True
    except Exception:
        return False


def decode_image(path: str, max_pixels: int = 4096 * 4096) -> np.ndarray:
    """One-shot native decode of a PNG/PGM to float32 grayscale."""
    lib = _load_library()
    buf = np.empty(max_pixels, np.float32)
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.ff_decode_file(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_pixels, ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        raise IOError(f"native decode failed ({rc}) for {path}")
    return buf[: h.value * w.value].reshape(h.value, w.value).copy()


class NativeFrameFeeder:
    """Prefetching iterator over a list of image paths."""

    def __init__(self, paths: Sequence[str], capacity: int = 16,
                 n_threads: int = 4):
        self._lib = _load_library()
        arr = (ctypes.c_char_p * len(paths))(
            *[p.encode() for p in paths])
        self._handle = self._lib.ff_create(arr, len(paths), capacity,
                                           n_threads)
        h = ctypes.c_int()
        w = ctypes.c_int()
        if self._lib.ff_dims(self._handle, ctypes.byref(h),
                             ctypes.byref(w)) != 0:
            raise IOError("frame feeder: failed to decode first frame")
        self.height = h.value
        self.width = w.value
        self._n = len(paths)

    def __len__(self):
        return self._n

    def __iter__(self):
        buf = np.empty((self.height, self.width), np.float32)
        while True:
            rc = self._lib.ff_next(
                self._handle,
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                self.height, self.width)
            if rc == -1:
                return
            if rc < 0:
                raise IOError(f"frame feeder error {rc}")
            yield rc, buf.copy()

    def close(self):
        if self._handle:
            self._lib.ff_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
