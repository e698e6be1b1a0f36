"""ctypes bindings for the native C++ decode/prefetch runtime
(csrc/dataloader.cpp). Falls back to the cv2 path when the shared object
hasn't been built (``make -C csrc``)."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_SO_PATH = os.path.join(os.path.dirname(__file__), "_native.so")
_lib = None


def _make(force: bool = False) -> bool:
    csrc = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
    try:
        subprocess.run(["make", "-C", csrc] + (["-B"] if force else []),
                       check=True, stdout=subprocess.DEVNULL,
                       stderr=subprocess.DEVNULL)
        return True
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH):
        _make()
    if not os.path.exists(_SO_PATH):
        return None
    lib = ctypes.CDLL(_SO_PATH)
    if not hasattr(lib, "loader_create_u8"):
        # stale .so from before the u8 ABI additions — rebuild in place
        if not _make(force=True):
            return None
        lib = ctypes.CDLL(_SO_PATH)
        if not hasattr(lib, "loader_create_u8"):
            return None
    lib.loader_create.restype = ctypes.c_void_p
    lib.loader_create.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.loader_create_u8.restype = ctypes.c_void_p
    lib.loader_create_u8.argtypes = [ctypes.c_int, ctypes.c_int,
                                     ctypes.c_int]
    lib.loader_submit.restype = ctypes.c_int
    lib.loader_submit.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                  ctypes.c_long]
    lib.loader_next.restype = ctypes.c_int
    lib.loader_next.argtypes = [ctypes.c_void_p,
                                ctypes.POINTER(ctypes.c_float),
                                ctypes.POINTER(ctypes.c_long)]
    lib.loader_next_u8.restype = ctypes.c_int
    lib.loader_next_u8.argtypes = [ctypes.c_void_p,
                                   ctypes.POINTER(ctypes.c_uint8),
                                   ctypes.POINTER(ctypes.c_long)]
    lib.loader_destroy.argtypes = [ctypes.c_void_p]
    lib.decode_resize.restype = ctypes.c_int
    lib.decode_resize.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                  ctypes.POINTER(ctypes.c_float)]
    lib.decode_resize_u8.restype = ctypes.c_int
    lib.decode_resize_u8.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                     ctypes.POINTER(ctypes.c_uint8)]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def decode_resize(path: str, image_size: int) -> np.ndarray:
    """Single synchronous decode -> (S, S, 3) float32 in [-1, 1]."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader not built")
    out = np.empty((image_size, image_size, 3), np.float32)
    rc = lib.decode_resize(
        path.encode(), image_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        raise IOError(f"decode failed: {path}")
    return out


def decode_resize_u8(path: str, image_size: int) -> np.ndarray:
    """Single synchronous decode -> (S, S, 3) uint8 RGB (normalize on
    device: x/127.5 - 1)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader not built")
    out = np.empty((image_size, image_size, 3), np.uint8)
    rc = lib.decode_resize_u8(
        path.encode(), image_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc != 0:
        raise IOError(f"decode failed: {path}")
    return out


class NativeImageLoader:
    """Order-preserving threaded prefetch: submit paths, pop decoded
    frames. GIL-free decode — the per-frame video feed for imitation.

    ``u8=True`` pops resized RGB uint8 instead of normalized float32:
    4x fewer host->device bytes per frame; normalize on device."""

    def __init__(self, image_size: int, threads: int = 4, capacity: int = 64,
                 u8: bool = False):
        lib = _load()
        if lib is None:
            raise RuntimeError("native loader not built")
        self._lib = lib
        self.image_size = image_size
        self.u8 = u8
        create = lib.loader_create_u8 if u8 else lib.loader_create
        self._h = create(threads, capacity, image_size)

    def submit(self, path: str, tag: int = 0):
        rc = self._lib.loader_submit(self._h, path.encode(), tag)
        if rc != 0:
            raise RuntimeError("loader shut down")

    def next(self) -> tuple:
        s = self.image_size
        tag = ctypes.c_long(0)
        if self.u8:
            out = np.empty((s, s, 3), np.uint8)
            rc = self._lib.loader_next_u8(
                self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                ctypes.byref(tag))
        else:
            out = np.empty((s, s, 3), np.float32)
            rc = self._lib.loader_next(
                self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                ctypes.byref(tag))
        if rc == -2:
            raise StopIteration
        if rc != 0:
            raise IOError("decode failed")
        return out, tag.value

    def close(self):
        if self._h:
            self._lib.loader_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
