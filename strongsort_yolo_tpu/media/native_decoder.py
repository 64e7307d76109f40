"""ctypes binding for the native ffmpeg decode shim
(native/video_decoder.cpp — SURVEY.md N1/N7).

``NativeVideoReader`` mirrors media/video.VideoReader's surface
(width/height/fps/ok, frame iteration, release). The decode runs in
C (libavformat/avcodec/swscale) and ctypes drops the GIL around each
``vd_read``, so per-stream reader threads decode while the device
computes. Availability is probed once; callers fall back to the cv2
reader when the shim or libav is absent.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libvideo_decoder.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-s", "libvideo_decoder.so"], cwd=_NATIVE_DIR,
                check=True, capture_output=True, timeout=300,
            )
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.vd_open.restype = ctypes.c_void_p
    lib.vd_open.argtypes = [ctypes.c_char_p]
    lib.vd_info.restype = ctypes.c_int
    lib.vd_info.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_long),
    ]
    lib.vd_read.restype = ctypes.c_int
    lib.vd_read.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.vd_close.restype = None
    lib.vd_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


class NativeVideoReader:
    """BGR frame iterator over a video file via the C decode shim."""

    def __init__(self, source: str):
        self.source = str(source)
        lib = _load()
        self._lib = lib
        self._h = None
        self.width = self.height = 0
        self.fps = 30.0
        self.nframes = 0
        if lib is None:
            return
        h = lib.vd_open(self.source.encode())
        if not h:
            return
        self._h = h
        w = ctypes.c_int()
        hh = ctypes.c_int()
        fps = ctypes.c_double()
        n = ctypes.c_long()
        lib.vd_info(h, ctypes.byref(w), ctypes.byref(hh), ctypes.byref(fps),
                    ctypes.byref(n))
        self.width = w.value
        self.height = hh.value
        self.fps = fps.value or 30.0
        self.nframes = n.value

    @property
    def ok(self) -> bool:
        return self._h is not None

    def __iter__(self) -> Iterator[np.ndarray]:
        if self._h is None:
            return
        buf = np.empty((self.height, self.width, 3), np.uint8)
        while True:
            r = self._lib.vd_read(self._h, buf.ctypes.data_as(ctypes.c_void_p))
            if r != 1:
                break
            yield buf.copy()

    def release(self):
        if self._h is not None:
            self._lib.vd_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.release()
        except Exception:
            pass


# ---------------------------------------------------------------------------
# Encoder (native/video_encoder.cpp — mp4/mpeg4, the reference's
# cv2 "mp4v" output format, yolo_multi_model.py:256-260)
# ---------------------------------------------------------------------------

_ENC_PATH = os.path.join(_NATIVE_DIR, "libvideo_encoder.so")
_enc_lib = None
_enc_tried = False


def _load_enc():
    global _enc_lib, _enc_tried
    if _enc_lib is not None or _enc_tried:
        return _enc_lib
    _enc_tried = True
    if not os.path.exists(_ENC_PATH):
        try:
            subprocess.run(
                ["make", "-s", "libvideo_encoder.so"], cwd=_NATIVE_DIR,
                check=True, capture_output=True, timeout=300,
            )
        except Exception:
            return None
    if not os.path.exists(_ENC_PATH):
        return None
    try:
        lib = ctypes.CDLL(_ENC_PATH)
    except OSError:
        return None
    lib.ve_open.restype = ctypes.c_void_p
    lib.ve_open.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_double,
    ]
    lib.ve_write.restype = ctypes.c_int
    lib.ve_write.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.ve_close.restype = ctypes.c_int
    lib.ve_close.argtypes = [ctypes.c_void_p]
    _enc_lib = lib
    return _enc_lib


def encoder_available() -> bool:
    return _load_enc() is not None


class NativeVideoWriter:
    """mp4 (MPEG-4) writer via the C encode shim; mirrors
    media/video.VideoWriter's surface."""

    def __init__(self, path: str, width: int, height: int, fps: float = 15.0):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._lib = _load_enc()
        self._h = None
        self.width, self.height = width, height
        if self._lib is not None:
            self._h = self._lib.ve_open(
                path.encode(), int(width), int(height), float(fps)
            )

    @property
    def ok(self) -> bool:
        return self._h is not None

    def write(self, frame: np.ndarray):
        if self._h is None:
            return
        frame = np.ascontiguousarray(frame, np.uint8)
        self._lib.ve_write(self._h, frame.ctypes.data_as(ctypes.c_void_p))

    def release(self):
        if self._h is not None:
            self._lib.ve_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.release()
        except Exception:
            pass
