"""ctypes bindings for the C++ native runtime (native/smpltpu_native.cpp):
parallel MediaPipe-JSON keypoint parsing and triangle rasterization.

The library auto-builds with g++ on first use and caches the .so next to
the sources; every entry point degrades to the pure-Python implementation
when the toolchain or the build is unavailable, so the framework stays
importable anywhere.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native",
    "smpltpu_native.cpp")
_SO = os.path.splitext(_SRC)[0] + ".so"
_lock = threading.Lock()
_lib = None
_failed = False


def ensure_built() -> bool:
    """Compile the native library if needed. Returns availability."""
    global _lib, _failed
    if _lib is not None:
        return True
    if _failed:
        return False
    with _lock:
        if _lib is not None:
            return True
        try:
            if (not os.path.isfile(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     "-o", _SO, _SRC, "-lpthread"],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(_SO)
            lib.smpltpu_parse_mp_json.restype = ctypes.c_int
            lib.smpltpu_parse_mp_json.argtypes = [
                ctypes.c_char_p, ctypes.c_long, ctypes.c_int, ctypes.c_int,
                ctypes.c_double, ctypes.POINTER(ctypes.c_double)]
            lib.smpltpu_parse_mp_json_files.restype = ctypes.c_int
            lib.smpltpu_parse_mp_json_files.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_double, ctypes.POINTER(ctypes.c_double)]
            lib.smpltpu_fill_triangles.restype = None
            lib.smpltpu_fill_triangles.argtypes = [
                ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
                ctypes.c_long]
            _lib = lib
            return True
        except (OSError, subprocess.CalledProcessError) as e:
            print(f"[smpltpu.native] build unavailable: {e}", file=sys.stderr)
            _failed = True
            return False


def available() -> bool:
    return ensure_built()


def parse_mp_json_bytes(data: bytes, width: int, height: int,
                        midpoint_default_vis: float = 1.0) -> np.ndarray:
    """One JSON buffer -> dense (17, 4) [jid, u, v, valid]."""
    assert ensure_built()
    out = np.zeros(17 * 4, dtype=np.float64)
    _lib.smpltpu_parse_mp_json(
        data, len(data), width, height, midpoint_default_vis,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out.reshape(17, 4)


def load_keypoint_dir_native(paths, width: int, height: int,
                             midpoint_default_vis: float = 1.0) -> np.ndarray:
    """Parse many JSON files (threaded in C++) -> (F, 17, 4)."""
    assert ensure_built()
    n = len(paths)
    out = np.zeros((n, 17, 4), dtype=np.float64)
    if n == 0:
        return out
    joined = "\n".join(paths).encode()
    _lib.smpltpu_parse_mp_json_files(
        joined, n, width, height, midpoint_default_vis,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out


def fill_triangles(img: np.ndarray, tris: np.ndarray,
                   gray: np.ndarray) -> None:
    """In-place painter-order triangle fill on a (H, W, 3) uint8 image."""
    assert ensure_built()
    assert img.dtype == np.uint8 and img.ndim == 3 and img.shape[2] == 3
    img_c = np.ascontiguousarray(img)
    tris_f = np.ascontiguousarray(tris, dtype=np.float32)
    gray_i = np.ascontiguousarray(gray, dtype=np.int32)
    _lib.smpltpu_fill_triangles(
        img_c.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        img.shape[0], img.shape[1],
        tris_f.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        gray_i.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        len(gray_i))
    if img_c is not img:
        img[:] = img_c
