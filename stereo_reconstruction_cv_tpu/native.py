"""ctypes bindings to the native runtime (libstereo_native.so).

Native components (SURVEY 'native code' requirement — the reference's
runtime is OpenCV C++ behind bindings; ours is a small first-party C++
library):

  stereo_native_filter_speckles — exact union-find connected-component
      speckle filter (cv2.filterSpeckles parity, host post-processing)
  stereo_native_jpeg_info / _decode — libjpeg image decode releasing the
      GIL, used by the prefetching data loader

Auto-builds with `make` on first import if the .so is missing; every entry
point has a pure-Python fallback so the framework works without a
toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libstereo_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR], check=True,
                capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
        lib.stereo_native_filter_speckles.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float,
        ]
        lib.stereo_native_jpeg_info.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.stereo_native_jpeg_info.restype = ctypes.c_int
        lib.stereo_native_jpeg_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ]
        lib.stereo_native_jpeg_decode.restype = ctypes.c_int
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def filter_speckles(
    disp: np.ndarray, valid: np.ndarray, max_size: int, max_diff: float
) -> np.ndarray:
    """Exact CC speckle filter. Returns the updated valid mask (copy)."""
    lib = _load()
    disp = np.ascontiguousarray(disp, np.float32)
    out = np.ascontiguousarray(valid, np.uint8).copy()
    if lib is None:
        return _filter_speckles_py(disp, out, max_size, max_diff)
    h, w = disp.shape
    lib.stereo_native_filter_speckles(
        disp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w, max_size, max_diff,
    )
    return out.astype(bool)


def _filter_speckles_py(disp, valid, max_size, max_diff):
    """BFS fallback (slow; correctness reference)."""
    import collections

    h, w = disp.shape
    seen = np.zeros((h, w), bool)
    keep = valid.astype(bool).copy()
    for sy in range(h):
        for sx in range(w):
            if seen[sy, sx] or not keep[sy, sx]:
                continue
            comp = [(sy, sx)]
            seen[sy, sx] = True
            q = collections.deque(comp)
            while q:
                y, x = q.popleft()
                for ny, nx in ((y + 1, x), (y - 1, x), (y, x + 1), (y, x - 1)):
                    if 0 <= ny < h and 0 <= nx < w and not seen[ny, nx] and keep[ny, nx]:
                        if abs(float(disp[ny, nx]) - float(disp[y, x])) <= max_diff:
                            seen[ny, nx] = True
                            comp.append((ny, nx))
                            q.append((ny, nx))
            if len(comp) <= max_size:
                for y, x in comp:
                    keep[y, x] = False
    return keep


def decode_jpeg(data: bytes, gray: bool = True) -> Optional[np.ndarray]:
    """Decode JPEG bytes -> (H, W) or (H, W, 3) uint8; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    if lib.stereo_native_jpeg_info(data, len(data), ctypes.byref(h), ctypes.byref(w), ctypes.byref(c)):
        return None
    if gray:
        out = np.empty((h.value, w.value), np.uint8)
    else:
        out = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.stereo_native_jpeg_decode(
        data, len(data), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), 1 if gray else 0
    )
    return out if rc == 0 else None


def load_image(path: str, gray: bool = True) -> Optional[np.ndarray]:
    with open(path, "rb") as f:
        return decode_jpeg(f.read(), gray)
