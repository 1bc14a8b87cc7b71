"""ctypes binding for the native threaded image loader (image_loader.cpp).

Builds the shared library on first use (make in this directory) and falls
back to a PIL ThreadPool implementation when the toolchain/libpng is absent,
so every pipeline stays runnable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libfnx_runtime.so")
_lib = None
_lib_lock = threading.Lock()


def _load_lib():
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(["make", "-C", _HERE], check=True, capture_output=True)
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.fnx_decode_png.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                                       ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.fnx_decode_png.restype = ctypes.c_int
        lib.fnx_loader_create.argtypes = [ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                                          ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                          ctypes.c_int, ctypes.c_int]
        lib.fnx_loader_create.restype = ctypes.c_void_p
        lib.fnx_loader_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
                                        ctypes.POINTER(ctypes.c_int)]
        lib.fnx_loader_next.restype = ctypes.c_int
        lib.fnx_loader_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load_lib() is not None


def decode_png(path: str, height: int, width: int, gray: bool = False) -> np.ndarray:
    """Decode+resize+normalize one PNG. Returns (C,H,W) or (H,W) float32."""
    lib = _load_lib()
    channels = 1 if gray else 3
    out = np.empty((channels, height, width), np.float32)
    if lib is not None:
        rc = lib.fnx_decode_png(path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                                height, width, int(gray))
        if rc == 0:
            return out[0] if gray else out
    # fallback
    from PIL import Image

    img = Image.open(path).convert("L" if gray else "RGB").resize((width, height), Image.BILINEAR)
    arr = np.asarray(img, np.float32) / 255.0
    return arr if gray else arr.transpose(2, 0, 1)


class NativeImageLoader:
    """Threaded prefetching iterator over a list of image paths.

    Yields (index, (C,H,W) float32) in completion order. Uses the C++ pool
    when available, else a Python ThreadPool."""

    def __init__(self, paths: List[str], height: int, width: int, gray: bool = False,
                 threads: int = 4, queue: int = 8):
        self.paths = list(paths)
        self.height, self.width, self.gray = height, width, gray
        self.channels = 1 if gray else 3
        self._lib = _load_lib()
        self._handle = None
        self._fallback_pool = None
        if self._lib is not None:
            arr = (ctypes.c_char_p * len(self.paths))(*[p.encode() for p in self.paths])
            self._paths_keepalive = arr
            self._handle = self._lib.fnx_loader_create(
                arr, len(self.paths), threads, height, width, int(gray), queue)
        else:
            from concurrent.futures import ThreadPoolExecutor

            self._fallback_pool = ThreadPoolExecutor(max_workers=threads)
            self._futures = [
                self._fallback_pool.submit(decode_png, p, height, width, gray)
                for p in self.paths
            ]
            self._fb_idx = 0

    def __iter__(self):
        return self

    def __next__(self):
        if self._handle is not None:
            out = np.empty((self.channels, self.height, self.width), np.float32)
            idx = ctypes.c_int(-1)
            rc = self._lib.fnx_loader_next(
                self._handle, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                ctypes.byref(idx))
            if rc != 0:
                raise StopIteration
            return int(idx.value), (out[0] if self.gray else out)
        if self._fb_idx >= len(self.paths):
            raise StopIteration
        i = self._fb_idx
        self._fb_idx += 1
        arr = self._futures[i].result()
        if self.gray:
            return i, arr
        return i, arr if arr.ndim == 3 else arr[None]

    def close(self):
        if self._handle is not None:
            self._lib.fnx_loader_destroy(self._handle)
            self._handle = None
        if self._fallback_pool is not None:
            self._fallback_pool.shutdown(wait=False)
            self._fallback_pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
