"""Native (C++) runtime components, bound via ctypes.

``imageio``: threaded PNG codec (see imageio.cpp) used by the sample
writer/reader on the 10k-image measure path.  The library is compiled on
first use with g++ and cached next to the source keyed by source mtime;
every entry point degrades to the PIL path when the toolchain or zlib is
unavailable, so the framework never hard-depends on the native build.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "imageio.cpp")
_LIB_PATH = os.path.join(os.path.dirname(__file__), "_imageio.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _build() -> bool:
    cmd = [
        "g++", "-O2", "-std=c++17", "-shared", "-fPIC", "-o", _LIB_PATH, _SRC,
        "-lz", "-pthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        if os.environ.get("VILLAN_DISABLE_NATIVE"):
            _lib_failed = True
            return None
        stale = (
            not os.path.exists(_LIB_PATH)
            or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)
        )
        if stale and not _build():
            _lib_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _lib_failed = True
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.vd_write_png.argtypes = [
            ctypes.c_char_p, u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
        ]
        lib.vd_write_png.restype = ctypes.c_int
        lib.vd_write_png_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), u8p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.vd_write_png_batch.restype = ctypes.c_int
        lib.vd_png_info.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.vd_png_info.restype = ctypes.c_int
        lib.vd_read_png.argtypes = [
            ctypes.c_char_p, u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.vd_read_png.restype = ctypes.c_int
        lib.vd_read_png_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), u8p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.vd_read_png_batch.restype = ctypes.c_int
        _lib = lib
        return _lib


def _as_u8p(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _paths_array(paths):
    arr = (ctypes.c_char_p * len(paths))()
    arr[:] = [p.encode() for p in paths]
    return arr


def write_png_batch(
    paths, images: np.ndarray, level: int = 6, n_threads: int = 0
) -> bool:
    """Write an (N,H,W,C) uint8 batch as PNGs; False -> caller should fall
    back to PIL."""
    lib = get_lib()
    if lib is None:
        return False
    imgs = np.ascontiguousarray(images)
    if imgs.dtype != np.uint8 or imgs.ndim != 4:
        return False
    n, h, w, c = imgs.shape
    if c not in (1, 3, 4) or n != len(paths):
        return False
    rc = lib.vd_write_png_batch(
        _paths_array(list(paths)), _as_u8p(imgs), n, h, w, c, level, n_threads
    )
    return rc == 0


def png_info(path: str):
    """(h, w, c) or None."""
    lib = get_lib()
    if lib is None:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    if lib.vd_png_info(path.encode(), ctypes.byref(h), ctypes.byref(w), ctypes.byref(c)):
        return None
    return h.value, w.value, c.value


def read_png_batch(paths, h: int, w: int, channels: int = 3, n_threads: int = 0):
    """Threaded decode into one (N,H,W,channels) uint8 array; None -> caller
    should fall back to PIL (unsupported PNG variant or no native lib)."""
    lib = get_lib()
    if lib is None or not paths:
        return None
    out = np.empty((len(paths), h, w, channels), np.uint8)
    rc = lib.vd_read_png_batch(
        _paths_array(list(paths)), _as_u8p(out), len(paths), h, w, channels,
        n_threads,
    )
    return out if rc == 0 else None
