"""ctypes binding for the native C++ media shim (native/media_shim.cpp).

Auto-builds ``libmedia_shim.so`` with make/g++ on first use (cached);
falls back cleanly if no toolchain is present — callers check
``available()``. The binding exposes the same drawing surface the
annotator uses, so the cv2 and native backends are interchangeable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmedia_shim.so")
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s"], cwd=_NATIVE_DIR, check=True,
            capture_output=True, timeout=300,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.shim_draw_rect.argtypes = [u8p] + [ctypes.c_int] * 6 + [
        ctypes.c_uint8] * 3 + [ctypes.c_int]
    lib.shim_draw_line.argtypes = lib.shim_draw_rect.argtypes
    lib.shim_draw_polyline.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
        i32p, ctypes.c_int, ctypes.c_int] + [ctypes.c_uint8] * 3 + [ctypes.c_int]
    lib.shim_fill_poly.argtypes = [u8p, ctypes.c_int, ctypes.c_int, i32p,
        ctypes.c_int] + [ctypes.c_uint8] * 3
    lib.shim_blend.argtypes = [u8p, u8p, ctypes.c_int64, ctypes.c_float,
        ctypes.c_float]
    lib.shim_draw_text.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_char_p, ctypes.c_int] + [
        ctypes.c_uint8] * 3
    lib.shim_text_size.argtypes = [ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.shim_resize_bilinear.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
        u8p, ctypes.c_int, ctypes.c_int]
    lib.shim_letterbox.argtypes = [u8p, ctypes.c_int, ctypes.c_int, u8p,
        ctypes.c_int, ctypes.c_uint8]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _iptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _chk(img: np.ndarray) -> np.ndarray:
    assert img.dtype == np.uint8 and img.ndim == 3 and img.shape[2] == 3
    return np.ascontiguousarray(img)


def draw_rect(img, x1, y1, x2, y2, color, thickness=1):
    lib = _load()
    b, g, r = (int(c) for c in color)
    lib.shim_draw_rect(_ptr(img), img.shape[0], img.shape[1],
                       int(x1), int(y1), int(x2), int(y2), b, g, r,
                       int(thickness))


def draw_line(img, x1, y1, x2, y2, color, thickness=1):
    lib = _load()
    b, g, r = (int(c) for c in color)
    lib.shim_draw_line(_ptr(img), img.shape[0], img.shape[1],
                       int(x1), int(y1), int(x2), int(y2), b, g, r,
                       int(thickness))


def draw_polyline(img, pts, color, thickness=1, closed=True):
    lib = _load()
    pts = np.ascontiguousarray(np.asarray(pts, np.int32).reshape(-1, 2))
    b, g, r = (int(c) for c in color)
    lib.shim_draw_polyline(_ptr(img), img.shape[0], img.shape[1],
                           _iptr(pts), len(pts), int(closed), b, g, r,
                           int(thickness))


def fill_poly(img, pts, color):
    lib = _load()
    pts = np.ascontiguousarray(np.asarray(pts, np.int32).reshape(-1, 2))
    b, g, r = (int(c) for c in color)
    lib.shim_fill_poly(_ptr(img), img.shape[0], img.shape[1], _iptr(pts),
                       len(pts), b, g, r)


def blend(dst, src, wa, wb):
    """dst = dst*wa + src*wb, in place (cv2.addWeighted parity)."""
    lib = _load()
    assert dst.shape == src.shape
    lib.shim_blend(_ptr(dst), _ptr(src), dst.size, float(wa), float(wb))


def draw_text(img, text, x, y, color, scale=1):
    lib = _load()
    b, g, r = (int(c) for c in color)
    lib.shim_draw_text(_ptr(img), img.shape[0], img.shape[1], int(x),
                       int(y), text.encode(), int(scale), b, g, r)


def text_size(text, scale=1):
    lib = _load()
    w = ctypes.c_int()
    h = ctypes.c_int()
    lib.shim_text_size(text.encode(), int(scale), ctypes.byref(w),
                       ctypes.byref(h))
    return w.value, h.value


def resize_bilinear(src, dh, dw):
    lib = _load()
    src = _chk(src)
    dst = np.empty((dh, dw, 3), np.uint8)
    lib.shim_resize_bilinear(_ptr(src), src.shape[0], src.shape[1],
                             _ptr(dst), dh, dw)
    return dst


def letterbox_u8(src, size, pad_val=114):
    lib = _load()
    src = _chk(src)
    dst = np.empty((size, size, 3), np.uint8)
    lib.shim_letterbox(_ptr(src), src.shape[0], src.shape[1], _ptr(dst),
                       int(size), int(pad_val))
    return dst
